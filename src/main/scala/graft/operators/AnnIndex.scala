package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index — the build-once / probe-many lifecycle the
  * inline [[Similarity.knnJoinIvfPq]] family lacks: every inline call
  * re-assigns cells and re-encodes PQ codes for the FULL corpus, so at
  * 100 TB the encode pass dominates every query. This index
  * materializes the encoded corpus ONCE as a maintained on-disk table
  * and answers k-NN joins from it; incremental append encodes only the
  * new batch. (The reference engine has no ANN surface — this is part
  * of the beyond-reference training-data-pipeline family, same public
  * literature as the inline joins: Jégou, Douze & Schmid, TPAMI'11.)
  *
  * On-disk layout at `indexPath`:
  * {{{
  *   _ann_layout                  GateLayout manifest: geometry (dim,
  *                                nlist, m, ksub, id/vec cols) AND the
  *                                trained quantizer itself (centroids +
  *                                codebooks, exact-round-trip doubles) —
  *                                the index is self-contained; probes
  *                                and appends never re-train
  *   base/cell=N/part….parquet    (corpus_id, codes, cn, vec) — the
  *                                built corpus, partitioned by coarse
  *                                cell so probes prune to nprobe/nlist
  *   delta-000001/cell=N/...      append batches, one dir per commit
  * }}}
  *
  * Scale shape: the ADC candidate scan reads only (corpus_id, codes,
  * cn) from the PROBED cell partitions — column-pruned and
  * partition-pruned, ~nprobe/nlist of the compressed table; the exact
  * rerank reads `vec` for the same pruned cells only (the inverted
  * lists carry their vectors, the standard IVF deployment shape —
  * codes stay hot, floats are touched at shortlist selectivity). No
  * step ever re-encodes a stored vector.
  *
  * Crash safety: a BUILD stages the whole index at a sibling
  * `_staging` root and commits with the two-rename swap ([[
  * MergeOps.upsertParquet]]'s discipline — recovery restores an
  * orphaned `_retired` copy before any read). An APPEND stages its
  * delta under `_delta_staging` inside the root and commits with ONE
  * atomic directory rename to the next `delta-NNNNNN` name — a crash
  * before the rename leaves invisible staging (swept on the next
  * call), after it a fully committed delta. Probes therefore see every
  * append all-or-nothing.
  *
  * Concurrency contract, per operation class: APPEND is
  * reader-concurrent (the delta rename is atomic and probes resolve
  * committed deltas only) — the steady-state pairing of daily appends
  * with continuous probes needs no coordination. BUILD and COMPACT are
  * full-swap MAINTENANCE ops under the same reader-exclusion contract
  * as the merge family's swaps ([[MergeOps.reshard]]'s precedent):
  * between their two renames a concurrent reader sees no index, an
  * in-flight probe planned against the pre-swap component list can
  * fail mid-scan, and a reader's crash-recovery restore can collide
  * with the swap (a loud rename failure, never silent corruption) —
  * schedule them against each other, or probe through a snapshot.
  *
  * Contract: `append` is for NEW ids (the same key-stability contract
  * the month merge declares) — re-appending an existing id leaves both
  * rows visible; route updates through a rebuild, or dedup downstream.
  */
object AnnIndex {

  private val layoutName = "_ann_layout"
  private val deltaPrefix = "delta-"
  private val deltaStaging = "_delta_staging"

  private def serVecs(vs: Seq[Seq[Double]]): String =
    vs.map(_.map(_.toString).mkString(",")).mkString(";")
  private def parseVecs(s: String): Seq[Seq[Double]] =
    s.split(";", -1).toSeq.map(_.split(",", -1).toSeq.map(_.toDouble))
  private def serBooks(bs: Seq[Seq[Seq[Double]]]): String =
    bs.map(serVecs).mkString("|")
  private def parseBooks(s: String): Seq[Seq[Seq[Double]]] =
    s.split("\\|", -1).toSeq.map(parseVecs)

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Crash recovery, split by caller class so READS never take
    * destructive actions that could race a concurrent APPEND (the one
    * writer class readers legitimately overlap — see the concurrency
    * contract above):
    *
    *  - readers (probe/census) only RESTORE a build that crashed
    *    between its two commit renames (the index's only copy sits at
    *    `_retired` and nothing is readable without the rename);
    *    staging and delta-staging debris is invisible to reads
    *    ([[deltaDirs]] matches committed names only) and is left for
    *    the next writer to sweep — a reader deleting it could destroy
    *    an in-flight append's staged files. The restore itself can
    *    only fire when `dest` is absent, a state APPEND never
    *    produces; against a LIVE build/compact swap it is the
    *    documented out-of-contract overlap and fails the swap loudly.
    *  - writers (build/append/compact, single-writer contract)
    *    additionally sweep uncommitted staging debris.
    */
  private def recover(fs: org.apache.hadoop.fs.FileSystem,
      dest: org.apache.hadoop.fs.Path, sweep: Boolean): Unit = {
    import org.apache.hadoop.fs.Path
    val staging = new Path(dest.getParent, dest.getName + "_staging")
    val retired = new Path(dest.getParent, dest.getName + "_retired")
    if (!fs.exists(dest) && fs.exists(retired) && !fs.rename(retired, dest))
      throw new java.io.IOException(
        s"found orphaned $retired but could not restore it to $dest")
    if (sweep) {
      fs.delete(retired, true)
      fs.delete(staging, true)
      if (fs.exists(dest))
        fs.delete(new Path(dest, deltaStaging), true)
    }
  }

  /** Encode a corpus slice with the index's quantizer:
    * (corpus_id, cell, codes, cn, vec). The one place the encode
    * arithmetic lives — build and append cannot drift apart. */
  private def encoded(df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]]): DataFrame =
    df.select(col(idCol).as("corpus_id"), col(vecCol).as("vec"))
      .withColumn("cell", Similarity.ivfAssignment(col("vec"), centroids))
      .withColumn("codes", Similarity.pqEncode(col("vec"), codebooks))
      .withColumn("cn", Similarity.norm(col("vec")))

  /** Build (or rebuild) the index: encode the full corpus once, stage
    * the complete index as a sibling root, swap it in. The quantizer
    * (trained by the caller via [[Similarity.trainIvfCentroids]] /
    * [[Similarity.trainPqCodebooks]], or pinned) is persisted in the
    * layout — the index answers probes with no other input. */
  def build(spark: SparkSession, indexPath: String, corpus: DataFrame,
      idCol: String, vecCol: String, centroids: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]]): Unit = {
    import org.apache.hadoop.fs.Path
    require(centroids.nonEmpty, "centroids must be non-empty")
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
      "codebooks must be non-empty")
    val dim = centroids.head.length
    val dsub = codebooks.head.head.length
    require(codebooks.length * dsub == dim,
      s"codebooks cover ${codebooks.length}·$dsub dims, corpus has $dim")
    val dest = new Path(indexPath)
    val fs = fsOf(spark, dest)
    recover(fs, dest, sweep = true)
    val staging = new Path(dest.getParent, dest.getName + "_staging")
    val retired = new Path(dest.getParent, dest.getName + "_retired")
    encoded(corpus, idCol, vecCol, centroids, codebooks)
      .repartition(col("cell"))
      .sortWithinPartitions(col("cell"), col("corpus_id"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cell")
      .parquet(new Path(staging, "base").toString)
    // a 0-row corpus writes a partitionless parquet dir that every
    // later read of the index would die on (schema inference finds
    // nothing) — refuse to commit an unreadable artifact, and leave
    // the live index (if any) untouched
    if (!hasCellDirs(fs, new Path(staging, "base"))) {
      fs.delete(staging, true)
      throw new IllegalArgumentException(
        s"refusing to build an ANN index from an EMPTY corpus at " +
          s"$indexPath — the artifact would be unreadable")
    }
    GateLayout.write(fs, new Path(staging, layoutName), Seq(
      "id_col" -> idCol, "vec_col" -> vecCol,
      "dim" -> dim.toString,
      "nlist" -> centroids.length.toString,
      "m" -> codebooks.length.toString,
      "ksub" -> codebooks.head.length.toString,
      "metric" -> "cosine",
      "centroids" -> serVecs(centroids),
      "codebooks" -> serBooks(codebooks)))
    fs.delete(retired, true)
    if (fs.exists(dest) && !fs.rename(dest, retired))
      throw new java.io.IOException(s"could not retire $dest")
    if (!fs.rename(staging, dest))
      throw new java.io.IOException(
        s"could not activate $staging as $dest (old index at $retired)")
    fs.delete(retired, true)
  }

  private def readLayout(fs: org.apache.hadoop.fs.FileSystem,
      dest: org.apache.hadoop.fs.Path): Map[String, String] = {
    val p = new org.apache.hadoop.fs.Path(dest, layoutName)
    require(fs.exists(p), s"no ANN index at $dest (missing $layoutName)")
    GateLayout.read(fs, p)
  }

  private def deltaDirs(fs: org.apache.hadoop.fs.FileSystem,
      dest: org.apache.hadoop.fs.Path): Seq[String] =
    if (!fs.exists(dest)) Nil
    else fs.listStatus(dest).map(_.getPath.getName)
      .filter(n => n.startsWith(deltaPrefix) &&
        n.stripPrefix(deltaPrefix).forall(_.isDigit)).sorted.toSeq

  /** Whether a staged component actually holds data: a 0-row
    * partitioned write leaves no `cell=` dirs, and committing such a
    * dir would make every later read of the index die on schema
    * inference. */
  private def hasCellDirs(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(dir) && fs.listStatus(dir)
      .exists(st => st.isDirectory && st.getPath.getName.startsWith("cell="))

  /** Incrementally add a batch: encode ONLY the batch with the
    * persisted quantizer and commit it as the next delta directory —
    * one atomic rename; the base and every prior delta are never
    * opened, let alone rewritten (the property the spec pins with a
    * file census). Cell geometry is frozen at build time — the
    * standard IVF posture; re-train + rebuild when drift matters. */
  def append(spark: SparkSession, indexPath: String, batch: DataFrame,
      idCol: String, vecCol: String): Unit = {
    import org.apache.hadoop.fs.Path
    val dest = new Path(indexPath)
    val fs = fsOf(spark, dest)
    recover(fs, dest, sweep = true)
    val m = readLayout(fs, dest)
    require(m("id_col") == idCol && m("vec_col") == vecCol,
      s"index at $indexPath was built on (${m("id_col")}, " +
        s"${m("vec_col")}), append offered ($idCol, $vecCol)")
    val staging = new Path(dest, deltaStaging)
    encoded(batch, idCol, vecCol,
        parseVecs(m("centroids")), parseBooks(m("codebooks")))
      .repartition(col("cell"))
      .sortWithinPartitions(col("cell"), col("corpus_id"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cell")
      .parquet(staging.toString)
    // an empty batch (routine: a day with no new rows) stages nothing
    // — committing the empty dir would brick every later read on
    // schema inference, so the append is a clean no-op instead
    if (!hasCellDirs(fs, staging)) {
      fs.delete(staging, true)
      return
    }
    var n = deltaDirs(fs, dest).lastOption
      .map(_.stripPrefix(deltaPrefix).toLong + 1).getOrElse(1L)
    var committed = false
    while (!committed) {
      // rename = the commit; a taken name (concurrent append) retries
      // at the next number — create-free CAS on the directory name
      val target = new Path(dest, f"$deltaPrefix$n%06d")
      if (fs.exists(target)) n += 1
      else if (fs.rename(staging, target)) committed = true
      else if (fs.exists(target)) n += 1
      else throw new java.io.IOException(
        s"could not commit delta $target for $indexPath")
    }
  }

  /** The persisted-index read: base + every committed delta, pruned to
    * `cells` (partition pruning — the scan unit the whole layout
    * exists for), with only `cols` read (column pruning: the ADC pass
    * never deserializes `vec`, the rerank never reads `codes`). */
  private def readCells(spark: SparkSession,
      dest: org.apache.hadoop.fs.Path, deltas: Seq[String],
      cells: Option[Seq[Int]], cols: Seq[String]): DataFrame =
    ("base" +: deltas).map { d =>
      val all = spark.read
        .parquet(new org.apache.hadoop.fs.Path(dest, d).toString)
      // None = a deliberately UNPRUNED read (the exact baseline is
      // inherently all-corpus) — stated here instead of a no-op
      // isin over every cell id
      cells.fold(all)(cs => all.filter(col("cell").isin(cs: _*)))
        .select(cols.map(col): _*)
    }.reduce(_ unionByName _)

  /** The empty-result schema both probes share when no cell is
    * probed: query_id typed from the query side, corpus_id from the
    * INDEX (footer-only read — an empty batch must not flip the
    * result schema when the two id types differ), plus the caller's
    * extra columns. */
  private def emptyProbeResult(spark: SparkSession,
      dest: org.apache.hadoop.fs.Path, queries: DataFrame,
      idCol: String,
      extra: Seq[org.apache.spark.sql.types.StructField]): DataFrame = {
    import org.apache.spark.sql.types._
    val corpusIdType = spark.read
      .parquet(new org.apache.hadoop.fs.Path(dest, "base").toString)
      .schema("corpus_id").dataType
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("query_id", queries.schema(idCol).dataType),
        StructField("corpus_id", corpusIdType),
        StructField("cosine", DoubleType)) ++ extra))
  }

  /** Answer an IVF-PQ k-NN join FROM the index — identical semantics
    * (and bit-identical results) to [[Similarity.knnJoinIvfPq]] over
    * the same corpus and quantizer, with the corpus-side assignment
    * and PQ encode replaced by reads of the persisted artifact. The
    * probed-cell set is collected once (bounded by nlist, never by
    * data) and pushed into the parquet scans as a partition filter.
    */
  def probe(spark: SparkSession, indexPath: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int = 2,
      shortlist: Int = 50): DataFrame = {
    import org.apache.hadoop.fs.Path
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val dest = new Path(indexPath)
    val fs = fsOf(spark, dest)
    recover(fs, dest, sweep = false)
    val lay = readLayout(fs, dest)
    val centroids = parseVecs(lay("centroids"))
    val codebooks = parseBooks(lay("codebooks"))
    val m = codebooks.length
    val ksub = codebooks.head.length
    val deltas = deltaDirs(fs, dest)
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
      .withColumn("_qn", Similarity.norm(col("_qv")))
      .withColumn("_lut", Similarity.pqLut(col("_qv"), codebooks))
      .withColumn("_cell",
        explode(Similarity.ivfProbes(col("_qv"), centroids, nprobe)))
    // the probed-cell set: ≤ nlist values regardless of query count —
    // the bounded driver artifact that turns both scans below into
    // partition-pruned reads of nprobe/nlist of the table
    val cells = q.select(col("_cell")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (cells.isEmpty)
      return emptyProbeResult(spark, dest, queries, idCol, Seq.empty)
    val codesSide = readCells(spark, dest, deltas, Some(cells),
        Seq("cell", "corpus_id", "codes", "cn"))
      .withColumnRenamed("cell", "_cell")
    val adc = codesSide
      .join(broadcast(q.select(col("_cell"), col("query_id"),
        col("_lut"), col("_qn"))), "_cell")
      .select(col("query_id"), col("corpus_id"),
        (Similarity.adcDot(col("_lut"), col("codes"), m, ksub) /
          (col("cn") * col("_qn"))).as("adc_cosine"))
    val cand = graft.plans.GroupedTopK.combined(adc, Seq("query_id"),
      Seq("adc_cosine", "corpus_id"), descending = true, shortlist)
    val vecSide = readCells(spark, dest, deltas, Some(cells),
      Seq("corpus_id", "vec", "cn"))
    val reranked = cand.select(col("query_id"), col("corpus_id"))
      .join(vecSide, "corpus_id")
      .join(broadcast(queries
        .select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
        .withColumn("_qn", Similarity.norm(col("_qv")))), "query_id")
      .select(col("query_id"), col("corpus_id"),
        (Similarity.dot(col("vec"), col("_qv")) /
          (col("cn") * col("_qn"))).as("cosine"))
    graft.plans.GroupedTopK.combined(reranked, Seq("query_id"),
      Seq("cosine", "corpus_id"), descending = true, k)
  }

  /** [[probe]] at a DECLARED recall target — the persisted index at
    * feature parity with [[Similarity.knnJoinIvfPqAtRecall]]: the
    * shortlist dial is calibrated against an exact baseline and the
    * smallest qualifying shortlist's pairs are returned with the
    * measured recall ×1000 on every row. The calibration core is
    * SHARED with the inline join ([[Similarity.ivfPqAtRecallCore]] —
    * one rule, two data sources), with the index's stored codes and
    * vectors injected where the inline join would re-encode: the ADC
    * ranking and the rerank read partition-pruned probed cells; only
    * the exact baseline (inherently all-corpus) reads every cell's
    * vectors. `sampleQueries > 0` runs that whole calibration on a
    * seeded hash-ordered query subset and applies the dial to all
    * queries through the plain [[probe]] — the same executable
    * at-scale posture as the inline knob. */
  def probeAtRecall(spark: SparkSession, indexPath: String,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nprobe: Int = 2, shortlists: Seq[Int] = Seq.empty,
      targetX100: Int = 90, sampleQueries: Int = 0): DataFrame = {
    import org.apache.hadoop.fs.Path
    require(targetX100 >= 1 && targetX100 <= 100,
      s"targetX100 in [1,100], got $targetX100")
    val ss = (if (shortlists.nonEmpty) shortlists
      else Seq(k, 2 * k, 4 * k, 8 * k)).distinct.sorted
    require(ss.head >= k, s"every shortlist must be >= k=$k, got $ss")
    // sample branch FIRST: it needs only the ladder — the recursive
    // calibration and the final probe each do their own layout read,
    // so parsing the quantizer here would be dead work
    if (sampleQueries > 0) {
      val (chosenS, recall) = Similarity.sampleDial(queries, idCol,
        sampleQueries, "shortlist", ss.last,
        qs => probeAtRecall(spark, indexPath, qs, idCol, vecCol, k,
          nprobe, ss, targetX100, 0))
      return probe(spark, indexPath, queries, idCol, vecCol, k,
          nprobe, chosenS)
        .withColumn("shortlist", lit(chosenS).cast("int"))
        .withColumn("recall_x1000", lit(recall))
    }
    val dest = new Path(indexPath)
    val fs = fsOf(spark, dest)
    recover(fs, dest, sweep = false)
    val lay = readLayout(fs, dest)
    val centroids = parseVecs(lay("centroids"))
    val codebooks = parseBooks(lay("codebooks"))
    val deltas = deltaDirs(fs, dest)
    val cells = queries.select(explode(
        Similarity.ivfProbes(col(vecCol), centroids, nprobe)).as("_c"))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    if (cells.isEmpty) {
      import org.apache.spark.sql.types._
      return emptyProbeResult(spark, dest, queries, idCol, Seq(
        StructField("shortlist", IntegerType),
        StructField("recall_x1000", LongType)))
    }
    val codesSide = readCells(spark, dest, deltas, Some(cells),
        Seq("cell", "corpus_id", "codes", "cn"))
      .withColumnRenamed("cell", "_cell")
      .withColumnRenamed("codes", "_codes")
      .withColumnRenamed("cn", "_cn")
    val vecSide = readCells(spark, dest, deltas, Some(cells),
        Seq("corpus_id", "vec", "cn"))
      .withColumnRenamed("vec", "_cv")
      .withColumnRenamed("cn", "_cn")
    // the exact baseline is inherently all-corpus: every cell's
    // stored vectors, renamed back to the caller's column contract
    val fullVecs = readCells(spark, dest, deltas, None,
        Seq("corpus_id", "vec"))
      .withColumnRenamed("corpus_id", idCol)
      .withColumnRenamed("vec", vecCol)
    val exactPairs = Similarity.knnJoinExact(fullVecs, queries,
        idCol, vecCol, k)
      .select(col("query_id"), col("corpus_id"))
    Similarity.ivfPqAtRecallCore(codesSide, vecSide, exactPairs,
      queries, idCol, vecCol, k, centroids, codebooks, nprobe, ss,
      targetX100)
  }

  /** Fold every committed delta into a fresh base — the periodic
    * floor-sweep that bounds a probe's component count (each probe
    * unions base + N deltas; sustained daily appends would otherwise
    * grow N without limit, and each component is a separate parquet
    * read). No vector is RE-ENCODED: the stored (cell, codes, cn,
    * vec) rows are carried as-is through one repartition-by-cell
    * rewrite — compaction cost is I/O-shaped, never quantization
    * work. Commits with the same whole-index two-rename swap as
    * [[build]] (a crash leaves either the old layout — base plus
    * deltas — or the new single base, never a mix), and the layout's
    * quantizer rides along unchanged so probe results are identical
    * before and after. Returns the number of deltas folded. */
  def compact(spark: SparkSession, indexPath: String): Int = {
    import org.apache.hadoop.fs.Path
    val dest = new Path(indexPath)
    val fs = fsOf(spark, dest)
    recover(fs, dest, sweep = true)
    val lay = readLayout(fs, dest)
    val deltas = deltaDirs(fs, dest)
    if (deltas.isEmpty) return 0
    val staging = new Path(dest.getParent, dest.getName + "_staging")
    val retired = new Path(dest.getParent, dest.getName + "_retired")
    ("base" +: deltas).map(d =>
        spark.read.parquet(new Path(dest, d).toString))
      .reduce(_ unionByName _)
      .withColumn("cell", col("cell").cast("int"))
      .repartition(col("cell"))
      .sortWithinPartitions(col("cell"), col("corpus_id"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cell")
      .parquet(new Path(staging, "base").toString)
    GateLayout.write(fs, new Path(staging, layoutName), lay.toSeq.sorted)
    fs.delete(retired, true)
    if (!fs.rename(dest, retired))
      throw new java.io.IOException(s"could not retire $dest for compact")
    if (!fs.rename(staging, dest))
      throw new java.io.IOException(
        s"could not activate $staging as $dest — usually a concurrent " +
          "reader's crash-recovery restored the old index mid-swap " +
          "(build/compact exclude readers by contract); the old index " +
          s"is live again, the compacted rewrite remains at $staging " +
          "for the next writer to sweep, and re-running compact " +
          "converges")
    fs.delete(retired, true)
    deltas.size
  }

  /** Maintenance census: (dir, cell, rows) per index component plus
    * the layout geometry — the observability row a maintained artifact
    * owes its operators. Bounded by components × nlist. */
  def census(spark: SparkSession, indexPath: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val dest = new Path(indexPath)
    val fs = fsOf(spark, dest)
    recover(fs, dest, sweep = false)
    readLayout(fs, dest) // fail fast on a missing/torn index
    val deltas = deltaDirs(fs, dest)
    ("base" +: deltas).map { d =>
      spark.read.parquet(new Path(dest, d).toString)
        .groupBy(col("cell").cast("int").as("cell"))
        .agg(count(lit(1)).as("n_vectors"))
        .withColumn("component", lit(d))
    }.reduce(_ unionByName _)
  }
}
