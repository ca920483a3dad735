package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audit (SURVEY §4): the optimizations we rely on at
  * cluster scale must actually appear in the executed plans — pushed
  * filters, pruned columns, broadcast joins for dims, top-k as
  * TakeOrderedAndProject, partial (map-side) aggregation. Failing here
  * means a plan silently degraded, even if results stay correct.
  */
class PlanAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.registry(name).fn(spark, sf)
    df.collect() // materialize THIS plan so AQE finalizes it (count()
                 // would execute a different derived plan)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("w_ntile_hist windows only ever see the histogram, never the scan") {
    // The point of the histogram-quantile variant: no per-key global
    // sort of the fact table. Pin it structurally — every Window in
    // the executed plan must sit ABOVE an aggregation (its input is
    // the bounded per-(priority, bin) histogram), and the exact-ntile
    // marker must be absent. w_ntile keeps the exact semantics (and
    // its per-key sort) as a separate row.
    // AQE off for the audit: adaptive stage wrappers are leaf nodes,
    // which would hide the tree from a structural traversal; the
    // property pinned (window input shape) is decided at compile time.
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val executed =
      try SparkEntry.registry("w_ntile_hist").fn(spark, sf)
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", prior)
    def hasAggBelow(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.collectWithSubqueries {
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
        case o: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => o
        case s: org.apache.spark.sql.execution.aggregate.SortAggregateExec => s
      }.nonEmpty
    val windows = executed.collectWithSubqueries {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "histogram boundaries should use a window " +
      "over the aggregated histogram — none found (plan changed shape?)")
    windows.foreach { w =>
      assert(hasAggBelow(w.child),
        s"a Window runs over non-aggregated input — the per-key sort " +
          s"crept back:\n${w.treeString.take(1500)}")
    }
    assert(!executed.toString.contains("ntile"),
      "exact ntile leaked into the histogram variant")
  }

  test("query registries have no name collisions (Map ++ would shadow)") {
    val regs = Seq(
      graft.operators.RelationalQueries.registry,
      graft.operators.TextQueries.registry,
      graft.operators.PipelineQueries.registry,
      graft.operators.V2Queries.registry,
      graft.operators.FunctionQueries.registry,
      graft.operators.MergeQueries.registry,
      graft.operators.SinkQueries.registry,
      graft.operators.SideTableQueries.registry,
      graft.operators.GeoQueries.registry,
      graft.operators.MiningQueries.registry,
      graft.streaming.StreamingQueries.registry)
    val total = regs.map(_.size).sum
    assert(total === SparkEntry.registry.size,
      s"registry name collision: $total keys across registries but " +
        s"${SparkEntry.registry.size} after merge — a query is shadowed")
  }

  test("filters are pushed to the parquet scan") {
    val p = plan("p7_threshold_filter")
    assert(p.contains("PushedFilters: ["), p.take(800))
    assert(p.contains("GreaterThanOrEqual(l_discount") ||
      p.contains("LessThan(l_quantity"), p.take(800))
  }

  test("stem2 search executes regex-free (dictionary INSET, not the chain)") {
    // The 70-rule Porter chain must touch only the collected vocab
    // dictionary at plan BUILD; the executed plan is an INSET probe.
    // Regression guard for the r11 pushdown trap (BENCH_NOTES): both
    // the distinct-pushdown and the constraint re-inference failure
    // modes would put regexp_replace back into this plan string.
    val p = plan("t9_text_search_stem2")
    assert(!p.contains("regexp_replace"),
      "stem chain leaked into the executed plan")
    // the dictionary filter itself, not just any INSET: 'query' stems
    // to a query term so it is always in the matched set on this
    // fixture, and it appears in NO other predicate (the stopword
    // list has no 'query'; \b keeps 'Subquery' from matching)
    assert("""(INSET|IN \()[^\n]*\bquery\b""".r.findFirstIn(p).isDefined,
      "dictionary INSET filter with matched tokens missing: " +
        p.take(800))
  }

  test("projection prunes the scan schema to selected columns") {
    val p = plan("s4_scan_projection")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("props"), "unused column read from parquet")
  }

  test("dimension joins broadcast, fact joins do not collect") {
    val p = plan("j1_broadcast_dims")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), "tiny dims must not sort-merge")
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("a9_topk_customers")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("aggregations are two-phase (map-side partial)") {
    val p = plan("q1_pricing_summary")
    // two HashAggregates around the exchange = partial + final
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(800))
    assert(p.contains("Exchange"))
  }

  test("whole-stage codegen covers the relational hot path") {
    // HOF lambdas (filter/transform) are CodegenFallback in Spark, so
    // the scorer's flag-building parts run interpreted by design; the
    // relational aggregation path must stay inside WSCG (formatted
    // explain annotates codegen stages with [codegen id : N]).
    val p = plan("q1_pricing_summary")
    assert(p.contains("[codegen id :"), p.take(800))
  }

  test("nested-schema pruning works on the depth-4 event schema (SURVEY §7.3 risk 8)") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_prune")
      .toFile.getAbsolutePath
    spark.read.schema(graft.schema.EventSchema.schema)
      .option("multiLine", true).json("fixtures/events_v2_sample.json")
      .write.mode("overwrite").parquet(s"$dir/ev")
    val df = spark.read.parquet(s"$dir/ev")
      .select(col("venue.name"), col("datetime.start_date"))
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the scan schema must contain only the selected nested leaves,
    // not the full venue struct (stages would drag the whole tree)
    assert(p.contains("venue:struct<name:string>"), p.take(1200))
    assert(!p.contains("stages"), "full venue struct read for a name projection")
  }

  test("point lookup pushes the key predicate") {
    val p = plan("p10_point_lookup")
    assert(p.contains("EqualTo(o_orderkey,42)"), p.take(800))
  }

  test("v2 fixture scan prunes documents to doc_id + text") {
    // the nested events table derives from two source columns only —
    // the parquet scan must not read lang/source/n_chars
    val p = {
      val df = graft.operators.V2Fixtures.raw(spark, sf)
      df.collect()
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    }
    assert(p.contains("ReadSchema"), p.take(500))
    assert(!p.contains("n_chars") && !p.contains("lang"),
      "fixture reads unused document columns:\n" + p.take(800))
  }

  test("scalar-function queries stay shuffle-free up to the final top-k") {
    // pure per-row column algebra over one scan: the only "ordering"
    // operator allowed is TakeOrderedAndProject (no Exchange, no Sort).
    for (q <- Seq("f3_date_ladder", "f7_price_extract", "k5_refresh_flags")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q: " + p.take(500))
      assert(!p.contains("Exchange"), s"$q shuffles a per-row projection")
    }
  }

  test("vocab profile runs through GroupedTopKExec with partial aggregation") {
    val p = plan("ta_vocab_topk")
    assert(p.contains("GroupedTopK"), p.take(600))
    // token counts must partial-aggregate before the exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(600))
    assert(!p.contains("Window"), "grouped top-k fell back to a window sort")
  }

  test("IVF-PQ candidate scan reads codes, not vectors; queries broadcast") {
    // The operator's scale contract: ADC candidate scoring runs over
    // the COMPRESSED corpus. Structurally: the broadcast side is the
    // (exploded) query side, no cartesian product, and the shortlist
    // reduction runs through GroupedTopK. The full-vector column may
    // appear only on the RERANK branch (shortlist-selectivity reads).
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    for (row <- Seq("sim_knn_join_ivfpq", "sim_knn_join_ivfpq_res")) {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val executed =
        try SparkEntry.registry(row).fn(spark, sf)
          .queryExecution.executedPlan
        finally spark.conf.set("spark.sql.adaptive.enabled", prior)
      import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
      val bjoins = executed.collectWithSubqueries {
        case b: BroadcastHashJoinExec => b
      }
      assert(bjoins.nonEmpty, s"$row: ADC join must broadcast queries")
      // the ADC join is the one keyed on _cell: its STREAMED (corpus)
      // side must not carry the full vector column — only codes + norm
      val adcJoins = bjoins.filter(_.leftKeys.exists(
        _.references.exists(_.name == "_cell")))
      assert(adcJoins.nonEmpty, s"$row: no join keyed on _cell found")
      adcJoins.foreach { j =>
        val streamedCols = j.left.output.map(_.name)
        assert(!streamedCols.contains("_cv"),
          s"$row: full vectors on the ADC scan side: $streamedCols")
        assert(streamedCols.contains("_codes"),
          s"$row: " + streamedCols.mkString(","))
      }
      assert(executed.collectWithSubqueries {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      }.isEmpty, s"$row: cartesian product in the IVF-PQ join")
      assert(executed.toString.contains("GroupedTopK"),
        s"$row: shortlist/top-k fell back from GroupedTopK")
    }
  }

  test("persisted-index probe: partition-pruned scans, broadcast " +
      "anti-join dedup — the base never shuffles in the steady state") {
    // The layout's scale contract, post latest-wins: with small
    // deltas the probe's base scan is (1) PARTITION-pruned to the
    // probed cells, (2) COLUMN-pruned (the ADC side never reads vec),
    // and (3) deduped via a BROADCAST left-anti join — never an
    // exchange+sort of the scanned base (only a delta backlog past
    // the broadcast bound may pay that).
    import graft.operators.{AnnIndex, IvfCentroids, PqCodebooks}
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_annplan")
      .toFile.getAbsolutePath + "/idx"
    val emb = graft.Tables.embeddings(spark, sf)
    AnnIndex.build(spark, dir, emb.filter(col("vec_id") % 7 =!= 3),
      "vec_id", "embedding", IvfCentroids.pinned, PqCodebooks.pinned)
    AnnIndex.append(spark, dir, emb.filter(col("vec_id") % 7 === 3),
      "vec_id", "embedding")
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val executed =
      try AnnIndex.probe(spark, dir,
          emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
          k = 3, nprobe = 2, shortlist = 9)
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", prior)
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val scans = executed.collectWithSubqueries {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    // (1) every index scan carries a partition filter on cell
    val indexScans = scans.filter(
      _.relation.location.rootPaths.exists(_.toString.contains("/idx")))
    assert(indexScans.nonEmpty, "no index file scans found")
    assert(indexScans.forall(_.partitionFilters.nonEmpty),
      "an index scan lost its probed-cell partition filter:\n" +
        indexScans.map(_.verboseStringWithSuffix(2)).mkString("\n"))
    // (2) the ADC-side scans never read vec alongside codes (column
    // pruning: vec appears only on rerank-branch scans, codes only on
    // ADC-branch scans)
    assert(indexScans.forall { s =>
      val cols = s.output.map(_.name)
      !(cols.contains("vec") && cols.contains("codes"))
    }, "an index scan reads vec AND codes — column pruning lost")
    // (3) the latest-wins dedup is a broadcast LEFT ANTI join on
    // corpus_id, and no sort runs over a base scan's output
    val anti = executed.collectWithSubqueries {
      case b: BroadcastHashJoinExec
        if b.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => b
    }
    assert(anti.nonEmpty, "latest-wins dedup is not a broadcast anti-join")
    assert(anti.forall(_.leftKeys.exists(
      _.references.exists(_.name == "corpus_id"))),
      "anti-join not keyed on corpus_id")
  }

  test("decontamination broadcasts the eval side, never doc x doc") {
    val p = plan("etl_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    assert(!p.contains("CartesianProduct"), "doc x doc join in decontamination")
  }

  test("sequence packing is one window pass, no extra shuffles") {
    val p = plan("etl_pack_sequences")
    // window partitioned by shard + final group-by: both hash-partition
    // on lang, so AQE/exchange-reuse should not need more than the two
    // logical exchanges
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p.take(800))
  }

  test("v2 serving queries hit the cached unified table, not re-unify") {
    val df = SparkEntry.registry("v2_venues").fn(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("InMemoryTableScan") || p.contains("Scan In-memory"),
      "v2 query did not read the materialized events table:\n" + p.take(800))
  }

  test("D3 merge bookkeeping rides the upsert's single key shuffle") {
    // losers + prior-history window aggregates must reuse the same
    // hashpartitioning(user_id) exchange as the row_number ranking —
    // one shuffle total on the union, not one per window
    val p = plan("d3_merge_log")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      "merge-log windows added a shuffle:\n" + p.take(1000))
  }

  test("S5 partitioned copy prunes months at the directory level") {
    val p = plan("s5_table_copy")
    // read-back filters on the partition column only → PartitionFilters
    // carry the month range and no row-level filter remains
    assert(p.contains("PartitionFilters: ["), p.take(800))
    assert(p.contains("start_month"), p.take(800))
  }

  test("search over five text fields stays a single-scan top-k") {
    val p = plan("v2_search")
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
    assert(!p.contains("Exchange hashpartitioning"),
      "relevance search shuffled a per-row projection:\n" + p.take(800))
  }

  test("per-row generators (chunking, frame sampling) never hash-shuffle") {
    for (q <- Seq("etl_chunk_documents", "mm_frame_sample")) {
      val p = plan(q)
      assert(p.contains("Generate"), s"$q: " + p.take(500))
      assert(!p.contains("Exchange hashpartitioning"),
        s"$q shuffled a per-row generation:\n" + p.take(800))
    }
  }

  test("hash split aggregates map-side before its one exchange") {
    val p = plan("etl_split")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(600))
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, p.take(800))
  }

  test("knn join: partial heaps before ONE candidate exchange, queries broadcast") {
    // raw plan string (arguments inline — the formatted tree separates
    // them, hiding the partitioning kind from a text match)
    val df = SparkEntry.registry("sim_knn_join").fn(spark, sf)
    df.collect()
    // AdaptiveSparkPlan.toString appends the initial plan after the
    // final one — audit only the final plan section
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // two GroupedTopK passes (partial + final)...
    assert("GroupedTopK".r.findAllIn(p).size >= 2, p.take(900))
    // ...with exactly one hash exchange between them: the candidate
    // shuffle. The full scored stream (corpus × queries) never moves
    // (the only other exchange is the final output sort's range
    // partitioning).
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p.take(900))
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastQueryStage"), p.take(900))
  }

  test("int8 quantization is a shuffle-free scan projection") {
    val p = plan("sim_quantize_int8")
    assert(!p.contains("Exchange hashpartitioning"),
      "per-row quantization shuffled:\n" + p.take(800))
  }

  test("snapshot diff is one join on (key, fingerprint) pairs only") {
    val p = plan("d5_snapshot_diff")
    // the join input projections must carry the md5 fingerprint, not
    // the compared payload columns
    assert(p.contains("md5"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("no registry query plans a cartesian or non-broadcast nested-loop join") {
    // Anti-regression sweep over the WHOLE registry: as queries are
    // added, none may silently plan an all-pairs join. Plans are
    // inspected un-executed (join strategy is decided before AQE), so
    // the RETURNED frames cost nothing to audit; the streaming family
    // is excluded because constructing its frames drains a real
    // stream. Caveat: construction itself is NOT free for every entry
    // — the sink/merge roundtrips write during construction (the
    // write IS the operator under test), and the checkpointing
    // constructors (calibration artifacts, dictionaries, fixpoints)
    // run real jobs at build time. The exact set of job-running
    // constructors is pinned by RegistrySmokeSpec's construction-job
    // audit; this sweep's own cost is dominated by them, not by the
    // plan inspection.
    val skip = (n: String) => n.startsWith("ev_stream_")
    for ((name, qd) <- SparkEntry.registry.toSeq.sortBy(_._1) if !skip(name)) {
      val p = qd.fn(spark, sf).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n" + p.take(800))
      if (p.contains("BroadcastNestedLoopJoin"))
        assert(p.contains("BroadcastExchange"),
          s"$name nested-loop joins without a broadcast build side:\n" +
            p.take(800))
    }
  }

  test("legacy-nanos guard answers from parquet footer stats: zero Spark jobs") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_nanos_guard")
      .toFile.getAbsolutePath
    // a legacy INT64-nanos ts column plus a fat payload column the
    // guard must NOT read; written as plain longs so the re-read
    // schema is LongType (the legacy branch) without nanos metadata
    val nanosBase = 1735689600L * 1000000000L
    spark.range(0, 1000)
      .select((lit(nanosBase) + col("id") * 1000000000L).as("ts"),
        concat(lit("x" * 200), col("id").cast("string")).as("payload"))
      .repartition(4).write.parquet(s"$dir/events_legacy")
    spark.range(0, 100)
      .select((lit(1735689600000000L) + col("id")).as("ts"))
      .write.parquet(s"$dir/events_micros")
    val raw = spark.read.parquet(s"$dir/events_legacy")
    assert(raw.schema("ts").dataType ===
      org.apache.spark.sql.types.LongType)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        // ignore spark.read.parquet's O(1) footer schema-inference job
        val metadataOnly = js.stageInfos.nonEmpty &&
          js.stageInfos.forall(_.name.startsWith("parquet at "))
        if (!metadataOnly) jobs.incrementAndGet()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val normalized = Tables.normalizeEventTs(raw)
      assert(normalized.schema("ts").dataType ===
        org.apache.spark.sql.types.TimestampType)
      // the guard still REFUSES micros-magnitude longs, also job-free
      val e = intercept[IllegalStateException] {
        Tables.normalizeEventTs(spark.read.parquet(s"$dir/events_micros"))
      }
      assert(e.getMessage.contains("not nanos-of-epoch magnitude"))
      org.apache.spark.GraftListenerHooks
        .waitUntilListenerBusEmpty(spark.sparkContext)
      assert(jobs.get() === 0,
        s"the magnitude guard ran ${jobs.get()} Spark job(s) — footer " +
          "statistics should answer it driver-side")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("LM filter: count table partial-aggregates; scoring joins on the bigram key") {
    val p = plan("ta_lm_quality_filter")
    // train + score both partial-aggregate before their exchanges
    assert("HashAggregate".r.findAllIn(p).size >= 4, p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    // the worst-100 tail must be a TakeOrdered partial top-k, not a
    // global sort of every scored doc
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("span-dup census: instance and doc-frequency aggs ride the shingle key") {
    val p = plan("dd_dup_span_fraction")
    // perDoc agg keyed (doc_id, s) and docFreq keyed (s) hash-shuffle;
    // the join back rides the s key; the final per-doc agg adds one
    // more — anything beyond four keyed exchanges means a plan
    // regression re-shuffled the exploded instance stream
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 4, p.take(1000))
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("temperature mix: langs-bounded aggregation with a broadcast total") {
    val p = plan("etl_temperature_mix")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(800))
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastQueryStage"),
      "1-row weight total did not broadcast:\n" + p.take(800))
  }

  test("geo bbox and radius-prefilter predicates push to the scan on stored coordinates") {
    import org.apache.spark.sql.functions._
    // the fixture derives lat/lon, so pushdown can't show there; this
    // is the production shape — coordinates as stored parquet columns
    val dir = java.nio.file.Files.createTempDirectory("graft_geo")
      .toFile.getAbsolutePath
    spark.range(0, 1000)
      .select(col("id"),
        (col("id") % 100 * 0.003 + 38.80).as("lat"),
        (col("id") % 83 * 0.004 + 1.20).as("lon"))
      .write.mode("overwrite").parquet(s"$dir/venues")
    val df = spark.read.parquet(s"$dir/venues")
      .filter(graft.operators.GeoOps.radiusPrefilter(
        col("lat"), col("lon"),
        graft.operators.GeoQueries.centerLat,
        graft.operators.GeoQueries.centerLon, 5000.0))
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PushedFilters: [") &&
      p.contains("GreaterThanOrEqual(lat") &&
      p.contains("LessThanOrEqual(lon"),
      "radius prefilter did not reach the parquet scan:\n" + p.take(1000))
  }

  test("LSH bucket probe on a bucket-partitioned table is partition-pruned") {
    import org.apache.spark.sql.functions._
    // the withLshBucket scaladoc's 100 TB contract: materialize the
    // bucketed corpus partitioned by bucket, and an ANN probe becomes
    // a partition-pruned scan of ~n/2^bits of the data. Prove the
    // PartitionFilters, not just claim them.
    val dir = java.nio.file.Files.createTempDirectory("graft_lshpart")
      .toFile.getAbsolutePath
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    graft.operators.Similarity
      .withLshBucket(emb, "embedding", bits = 4, dim = 64)
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dir/corpus")
    val probe = spark.read.parquet(s"$dir/corpus")
      .filter(col("bucket") === 5)
    probe.collect()
    val p = probe.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PartitionFilters") && p.contains("bucket"),
      "bucket probe did not partition-prune:\n" + p.take(1000))
    val m = "PartitionFilters: \\[[^\\]]*equal[^\\]]*bucket".r
    assert(m.findFirstIn(p.toLowerCase).isDefined ||
      p.contains("(bucket#") || p.contains("bucket = 5"),
      "bucket equality not in PartitionFilters:\n" + p.take(1000))
  }

  test("cube computes all grouping sets in one Expand, not a union of scans") {
    val p = plan("a18_cube")
    assert(p.contains("Expand"), p.take(600))
    assert(!p.contains("Union"), "cube fell back to unioned rescans")
  }

  test("assoc rules broadcast the 1-row basket count, never collect it") {
    val p = plan("mb_assoc_rules")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p.take(800))
    assert(!p.contains("CartesianProduct"), "basket count cross-join " +
      "planned as a cartesian product instead of a broadcast")
  }

  test("incremental near-dup broadcasts the batch side into the corpus probe") {
    val df = SparkEntry.registry("dd_incremental_neardup").fn(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "batch bands did not broadcast:\n" + p.take(800))
  }

  test("month join prunes fact partitions DYNAMICALLY from the dim filter") {
    val p = plan("j_dpp_month")
    assert(p.toLowerCase.contains("dynamicpruning"),
      "no DynamicPruningExpression in the fact scan:\n" + p.take(1200))
  }

  test("bucketed co-located join has NO exchange on either join input") {
    val df = SparkEntry.registry("j_bucket_colocated").fn(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), "merge hint ignored:\n" + p.take(800))
    // the bucket layout must feed the join directly: any Exchange
    // hash-partitioned on an orderkey means the write-time bucketing
    // was not picked up and the join re-shuffled both fact tables
    assert(!"Exchange[^\n]*orderkey".r.findFirstIn(p).isDefined,
      "join input re-shuffled despite bucketing:\n" + p.take(1200))
    assert(p.contains("Bucketed: true"),
      "scan did not report bucketed read:\n" + p.take(1200))
  }
}
