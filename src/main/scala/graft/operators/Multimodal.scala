package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque binary
  * columns with typed metadata, plus the decode / feature-extract /
  * frame-sample plumbing a training-data pipeline needs.
  *
  * The actual media codecs are NOT available in this environment, so
  * the decode step is a clearly-marked DETERMINISTIC STUB (features
  * derived from content hashes). Everything around it — schema,
  * format sniffing, size-aware partitioning, batch shape — is real and
  * is what matters at 100 TB: media bytes dominate shuffle volume, so
  * partitioning is by cumulative byte size, not row count, and
  * metadata-only projections must never touch the binary column
  * (columnar pruning keeps scans cheap).
  */
object Multimodal {

  /** Sniff the container format from magic bytes — real, not stubbed. */
  def sniffMime(bytes: Column): Column = {
    val magic = hex(substring(bytes, 1, 12))
    when(magic.startsWith("FFD8FF"), "image/jpeg")
      .when(magic.startsWith("89504E47"), "image/png")
      .when(magic.startsWith("47494638"), "image/gif")
      .when(magic.startsWith("52494646") && magic.substr(17, 8) === "57415645", "audio/wav")
      .when(magic.startsWith("494433") || magic.startsWith("FFFB"), "audio/mpeg")
      .when(magic.substr(9, 8) === "66747970", "video/mp4")
      .otherwise("application/octet-stream")
  }

  /** Attach typed metadata to a binary media column: byte size, mime
    * from magic bytes, content digest for dedup.
    */
  def withMediaMeta(df: DataFrame, bytesCol: String): DataFrame =
    df.withColumn("media_meta", struct(
      length(col(bytesCol)).cast("long").as("n_bytes"),
      sniffMime(col(bytesCol)).as("mime"),
      md5(col(bytesCol)).as("digest")))

  /** STUB decode → feature vector. Deterministic fake: 8 doubles from
    * xxhash64 over salted content — stands in for a real image/audio
    * model until codecs are available. The signature (binary → fixed
    * array<double>) and the per-row, no-shuffle execution shape are the
    * real contract.
    */
  def extractFeaturesStub(bytes: Column, dim: Int = 8): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(bytes, i), lit(1000000L)).cast("double") /
        lit(500000.0)) - lit(1.0))

  /** STUB resize: deterministic stride-decimation of the payload to a
    * target byte budget (stands in for pixel resampling; the real
    * implementation swaps the byte stride for an image scaler with the
    * same binary→binary signature and byte-budget contract). Keeps the
    * magic-byte header intact so mime sniffing still works downstream.
    */
  def resizeStub(bytes: Column, targetBytes: Int, headerBytes: Int = 16): Column = {
    val total = length(bytes)
    val body = bytes.substr(lit(headerBytes + 1), total - headerBytes)
    val stride = greatest(lit(1),
      ((total - headerBytes).cast("double") / lit((targetBytes - headerBytes).toDouble))
        .cast("int"))
    val sampled = aggregate(
      transform(
        sequence(lit(1),
          greatest(lit(0), ((total - headerBytes) / stride).cast("int"))),
        i => body.substr(lit(1) + (i - 1) * stride, lit(1))),
      lit(Array.emptyByteArray),
      (acc, piece) => concat(acc, piece))
    when(total <= targetBytes, bytes)
      .otherwise(concat(bytes.substr(1, headerBytes), sampled))
  }

  /** STUB frame sampling: n evenly-spaced byte windows from a video
    * blob — the slicing/batching plumbing of real frame extraction.
    */
  def sampleFramesStub(bytes: Column, n: Int, frameBytes: Int = 64): Column = {
    val total = length(bytes)
    val stride = greatest(lit(1),
      ((total - lit(frameBytes)) / lit(math.max(n - 1, 1))).cast("int"))
    transform(sequence(lit(0), lit(n - 1)),
      i => bytes.substr(lit(1) + i * stride, lit(frameBytes)))
  }

  /** Size-aware repartitioning: true byte-cumulative bin packing so
    * each output partition carries ≈ targetBytes of payload — the knob
    * that keeps decode batches memory-bounded on executors regardless
    * of row width skew. (Row-count partitioning is wrong for media:
    * one 4K video ≈ 10⁵ thumbnails.)
    *
    * Mechanics — a distributed prefix sum, NOT a global sort/window
    * (which would funnel every row through one task):
    *  1. narrow pass over just the byte lengths → per-input-partition
    *     totals (tiny: one row per partition, collected to the driver
    *     and turned into running offsets);
    *  2. narrow pass tagging each row with bin = floor(globalStartByte
    *     / targetBytes), where globalStartByte = partition offset +
    *     running total within the partition;
    *  3. one range repartition on the bin id — the only shuffle that
    *     moves payload, and bins are contiguous so each output
    *     partition receives ≈ one bin.
    * A partition can exceed targetBytes by at most the single row that
    * straddles its boundary (rows are never split). Both passes must
    * observe the same source partitioning — true for deterministic
    * inputs (file sources); cache the input first if it is not.
    */
  def repartitionByBytes(df0: DataFrame, bytesCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    require(df0.schema(bytesCol).dataType ==
        org.apache.spark.sql.types.BinaryType,
      s"$bytesCol must be BinaryType, got ${df0.schema(bytesCol).dataType}")
    // Both passes must see identical partitioning AND row order;
    // persist defensively so nondeterministic upstreams (round-robin
    // repartition, shuffles) cannot mismatch offsets between passes.
    // The cache must outlive the returned (lazy) plan — callers may
    // unpersist once the result is materialized.
    val df = df0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spark = df.sparkSession
    val byteIdx = df.schema.fieldIndex(bytesCol)
    val partTotals = df.select(length(col(bytesCol)).cast("long")).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        Iterator.single(pid -> it.map(r => if (r.isNullAt(0)) 0L else r.getLong(0)).sum)
      }.collect().toMap
    // offsets(pid) = total bytes in partitions before pid.
    val sortedPids = partTotals.keys.toSeq.sorted
    val offsets = sortedPids
      .zip(sortedPids.scanLeft(0L)(_ + partTotals(_)).init).toMap
    val total = partTotals.values.sum
    val parts = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val binned = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = offsets.getOrElse(pid, 0L)
      it.map { r =>
        val v = r.get(byteIdx)
        val n = if (v == null) 0L else v.asInstanceOf[Array[Byte]].length.toLong
        val bin = run / targetBytes
        run += n
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ bin)
      }
    }
    spark.createDataFrame(binned,
        df.schema.add("_byte_bin", org.apache.spark.sql.types.LongType))
      .repartitionByRange(parts, col("_byte_bin"))
      .drop("_byte_bin")
  }

  /** Metadata-only projection — the pattern callers must use for
    * counting/filtering media without dragging blobs through the plan.
    */
  def mediaStats(df: DataFrame): DataFrame =
    df.groupBy(col("media_meta.mime").as("mime"))
      .agg(count(lit(1)).as("n"),
        sum(col("media_meta.n_bytes")).as("total_bytes"),
        countDistinct(col("media_meta.digest")).as("distinct_content"))
      .orderBy(col("mime"))

  /** Batched decode/feature-extract plumbing — the Scala analog of a
    * Pandas mapInPandas decode: rows stream through executor-side
    * model batches of `batchSize` (models want batches, not single
    * rows), and the output schema (id + fixed-width float vector) is
    * declared up front. The model itself is pluggable; the default is
    * the DETERMINISTIC STUB below (real codecs aren't available in
    * this environment). Partition-local, no shuffle; combine with
    * repartitionByBytes so batches are memory-bounded.
    */
  def batchedFeatureExtract(df: DataFrame, idCol: String, bytesCol: String,
      batchSize: Int, dim: Int = 8,
      model: (Seq[Array[Byte]], Int) => Seq[Array[Float]] = stubBatchModel)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          val feats = model(batch.map(_._2), dim)
          require(feats.size == batch.size,
            s"model returned ${feats.size} vectors for ${batch.size} inputs")
          batch.map(_._1).zip(feats)
        }
      }
      .toDF(idCol, "features")
  }

  /** STUB batch model: per-item hash-derived features (same shape and
    * value range as extractFeaturesStub, but a different hash family —
    * MurmurHash3 here vs xxhash64 there, so the vectors differ),
    * standing in for a real batched image/audio model with the same
    * signature.
    */
  def stubBatchModel(batch: Seq[Array[Byte]], dim: Int): Seq[Array[Float]] =
    batch.map { bytes =>
      (0 until dim).map { i =>
        val h = java.lang.Math.floorMod(
          scala.util.hashing.MurmurHash3.bytesHash(bytes, i).toLong, 1000000L)
        (h.toDouble / 500000.0 - 1.0).toFloat
      }.toArray
    }
}
