package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Millisecond-precision JSON rendering: the driver's BENCH artifact
    * is a stdout tail-scrape, and round 11's full-precision doubles
    * pushed the 146-query line past the scrape window ("parsed": null,
    * the complete record surviving only in the file copies). 4 decimals
    * is ~40% fewer bytes and far below measurement noise. */
  private def f4(d: Double): String =
    if (d.isNaN || d.isInfinite) "null" // raw NaN/Infinity tokens are invalid JSON
    else BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString

  /** Fixed-decimals rendering for the compact scraped line (see below). */
  private def fN(d: Double, decimals: Int): String =
    if (d.isNaN || d.isInfinite) "null"
    else BigDecimal(d).setScale(decimals, BigDecimal.RoundingMode.HALF_UP).toString

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Exchanges START wide only when the corpus is big enough to need
    // it, and AQE coalesces them to its advisory target from measured
    // sizes (the PLANS.md deployment sizing). At sf >= 1 a corpus-scale
    // exchange (e.g. x3's budgeted pair volume, ~3e8 rows at sf10)
    // lands ~1M rows per final-aggregation task instead of ~10M: the
    // per-task hash map stays under the task memory slice and the
    // sort-fallback spill (measured 47 GB of temp_local at sf10 under
    // 32 fixed partitions — 3x the exchange itself) never starts. At
    // sf <= 0.1 the wide start is NOT free, round-11's flat 512
    // measured it: multi-stage iterative queries (x73's 8 power steps,
    // the 3-round Lloyd family) paid 512-reducer startup per exchange —
    // 1.9-3.4x on exactly that family — so small inputs keep the
    // cpu-count default. The cut is input SIZE (sf1 is ~180 MB, sf0.1
    // ~18 MB), env-overridable for deployments that know better.
    val sfBytes =
      try {
        val s = java.nio.file.Files.walk(java.nio.file.Paths.get(sfDir))
        try s.filter(p => java.nio.file.Files.isRegularFile(p))
          .mapToLong(p => java.nio.file.Files.size(p)).sum()
        finally s.close()
      } catch { case scala.util.control.NonFatal(_) => 0L }
    val initialPartitions = sys.env.getOrElse(
      "SPARK_GRAFT_INITIAL_PARTITIONS",
      if (sfBytes >= 100L * 1024 * 1024) "512" else cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        initialPartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Honest measurement: execute the MATERIALIZED plan via the built-in
    // noop sink — every operator runs, including each query's final
    // orderBy (a bare .count() would let EliminateSorts prune it, under-
    // measuring sort-heavy queries relative to what Verify hash-checks),
    // while writing nothing.
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // --shared: EMBEDDING-SESSION mode — run the named queries once
    // each, in order, WITHOUT per-query cache release, measuring the
    // materialize-once deployment stance (Dedup.pairTable: the first
    // consumer pays for the LSH pair build, the rest read it). Emits
    // metric "shared_session" so the number can never be confused with
    // the standalone battery, which releases caches between timed runs
    // and charges every query its own build (the honesty rule). Default
    // set = the composed-dedup trio behind the seam.
    val sharedMode = args.contains("--shared")
    val qargs = args.filterNot(_ == "--shared")
    // Optional args restrict the run to the named queries (iteration aid);
    // unknown names fail fast instead of silently measuring nothing.
    val unknown = qargs.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}")
      sys.exit(2)
    }
    val selected =
      if (qargs.nonEmpty) SparkEntry.queries.filter(kv => qargs.contains(kv._1))
      else SparkEntry.queries
    if (sharedMode) {
      val names =
        if (qargs.nonEmpty) qargs.toSeq
        else Seq(
          // the composed-dedup trio behind Dedup.pairTable, then the
          // x117 capstone build consuming the SAME session-shared pair
          // build + component seams (its deployment stance: the corpus
          // build runs where the dedup family already materialized its
          // stages — standalone, it honestly pays them itself)
          "x99_lsh_recall", "x101_dup_components", "x102_canonical_keep",
          "x117_corpus_build",
          // the trained-ANN family behind Similarity.trainedCentroids:
          // the first consumer trains the Lloyd quantizer, the rest
          // read the memoized artifact
          "x34_ann_trained", "x90_cluster_quality", "x105_ivfpq_topk",
          "x106_ivfpq_recall", "x108_semantic_decontaminate")
      // JIT/codegen warmup on the first query, caches released — the
      // timed pass still pays the pair build exactly once (first query)
      try run(SparkEntry.queries(names.head)) catch { case _: Throwable => }
      util.OperatorCaches.release(spark)
      val timed = names.map { n =>
        val t0 = System.nanoTime()
        run(SparkEntry.queries(n))
        n -> (System.nanoTime() - t0) / 1e9
      }
      util.OperatorCaches.release(spark)
      val qsJson = timed.map { case (k, v) => s"\"" + k + "\":" + f4(v) }
        .mkString("{", ",", "}")
      println(s"""{"metric":"shared_session","value":${f4(timed.map(_._2).sum)},"unit":"sec","queries":$qsJson,"sf":"$sfDir"}""")
      spark.stop()
      return
    }
    // FAIL LOUDLY. Round 7 shipped a 15-query outage as "total 89 s, rc=0"
    // because every exception here was swallowed: a query that throws was
    // recorded as a ~0.06 s success. Every failure now lands in the
    // emitted JSON ("errors") and flips the exit code.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def errMsg(e: Throwable): String = {
      val m = Option(e.getMessage).getOrElse("").trim
      val s = if (m.nonEmpty) m else e.getClass.getName
      s.linesIterator.next().take(300)
    }
    // Analysis pre-check (plan only, no execution): a query broken at
    // analysis time — the round-7 failure mode — is caught in
    // milliseconds here and excluded from the timed battery instead of
    // polluting it with sub-100ms "successes".
    val analyzed = selected.toSeq.sortBy(_._1).filter { case (name, fn) =>
      try { fn(spark, sfDir).schema; true }
      catch { case e: Throwable => errors(name) = errMsg(e); false }
    }
    // Warm the JVM/codegen/scan paths on one of the queries actually under
    // measurement, so the first timed query isn't billed for session init.
    // A warmup-only execution failure is still a failure — record it.
    analyzed.headOption.foreach { case (name, fn) =>
      try { run(fn) }
      catch { case e: Throwable => errors.getOrElseUpdate(name, errMsg(e)) }
      util.OperatorCaches.release(spark)
    }
    // Report min of two runs per query: steady-state cost, de-noised from
    // JIT warmup of interpreted expression paths and this host's sporadic
    // multi-second hypervisor scheduling stalls (observed 60s+ idle-wait
    // outliers on otherwise-4s queries, uncorrelated with plan shape).
    def one(name: String,
            fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      if (errors.contains(name)) return Double.NaN // don't re-run known-broken
      val t0 = System.nanoTime()
      try { run(fn) }
      catch { case e: Throwable => errors(name) = errMsg(e) }
      val dt = (System.nanoTime() - t0) / 1e9
      // Drop operator-level persist() caches THROUGH the CacheManager
      // (Dataset.unpersist clears the plan→cache mapping; a raw-RDD
      // unpersist would leave it behind, making the next run's
      // identical persist() a no-op that then recomputes uncached) —
      // every timed run must pay (and measure) its own cache
      // population. Scoped release via the registry, not clearCache.
      util.OperatorCaches.release(spark)
      dt
    }
    // INTERLEAVED min-of-3 + median-of-3: run the whole battery three
    // times and take each query's min AND median across passes — any two
    // samples of a query are a full battery (~half a minute) apart, so a
    // steal burst can poison at most one of them. The median is the
    // round-over-round comparison number (robust to one poisoned sample
    // BY CONSTRUCTION, where min-of-N still needs the deferred-retry
    // machinery below); the min remains the steady-state/baseline
    // number. The back-to-back formulation this replaces sampled runs
    // inside the same burst (measured: the same query 4-6× inflated in
    // consecutive runs, while clean in a battery run minutes later).
    val sorted = analyzed
    val pass1 = sorted.map { case (name, fn) => name -> one(name, fn) }.toMap
    val pass2 = sorted.map { case (name, fn) => name -> one(name, fn) }.toMap
    val medians = scala.collection.mutable.Map.empty[String, Double]
    val firstPass = sorted.map { case (name, fn) =>
      val t3 = one(name, fn)
      (name, fn, List(pass1(name), pass2(name), t3), System.nanoTime())
    }
    // Deferred outlier retries: this host's hypervisor-steal bursts span
    // ~1 min — long enough to poison BOTH back-to-back runs of whichever
    // query they land on (and a third consecutive run too, observed on
    // x2 in the round-2 driver bench: 23 s recorded vs 1.9-3.3 s solo).
    // Queries still over the threshold retry AFTER the whole battery has
    // run; if the outlier was measured moments ago (it was late in the
    // battery and nothing else needs retrying), wait out the remainder
    // of a 25 s window first so the retry is ALWAYS decorrelated from
    // the burst that poisoned the measurement. Up to two retries,
    // stopping at the first clean reading; min-of-N semantics are
    // unchanged — only the Nth run's timing moves.
    // Threshold sits just above the slowest CLEAN steady states (~3 s);
    // x28's iterative connected components legitimately run ~4.3-5 s, so
    // it alone carries a higher ceiling — without the override every
    // battery would burn both its retries (plus decorrelation waits) on
    // a healthy query. Measured motivation for 3.5 over the previous
    // 6.0: steal bursts routinely inflate 0.6-1.5 s queries to 2-4.5 s
    // (different queries each run), which the old threshold recorded as
    // truth — two consecutive solo batteries differed by 8 s of pure
    // noise below the retry line.
    val SlowSec = 3.5
    // queries whose CLEAN steady state exceeds the default line (x28's
    // driver union-find epilogue; x33/x34 run three Lloyd iterations,
    // x34 plus the probe/rank search on top) — without the overrides a
    // healthy battery burns both retries plus decorrelation waits on them
    val SlowSecOverride = Map(
      "x28_dup_clusters" -> 6.5,
      "x33_kmeans_train" -> 4.5,
      "x34_ann_trained" -> 5.5)
    // A sample set's median is the LOWER middle of the sorted samples —
    // with 3 clean samples that is the true median, and after one retry
    // (4 samples, one poisoned) it is the second-smallest, i.e. the
    // poisoned sample is discarded by construction.
    def medOf(ss: List[Double]): Double = {
      val s = ss.sorted; s((s.length - 1) / 2)
    }
    // The median's steal line: round 11 recorded x113 at median 58.7 s
    // against its own 11.65 s min (a query cannot cost 5x more on the
    // same data) because the deferred-retry machinery protected only
    // the min while the median was the declared round-over-round
    // number. A median more than 3x its own min (with a small absolute
    // allowance so sub-second queries don't burn 25 s decorrelation
    // waits over scheduling jitter) is now retried exactly like a slow
    // min, and each retry's sample re-enters the median.
    def medianPoisoned(ss: List[Double]): Boolean =
      medOf(ss) > math.max(3.0 * ss.min, ss.min + 0.8)
    val results = firstPass.map { case (name, fn, samples3, firstAt) =>
      val threshold = SlowSecOverride.getOrElse(name, SlowSec)
      var ss = samples3
      var measuredAt = firstAt
      var retries = 0
      while ((ss.min > threshold || medianPoisoned(ss)) && retries < 2 &&
          !errors.contains(name)) {
        val elapsed = (System.nanoTime() - measuredAt) / 1e9
        if (elapsed < 25.0) Thread.sleep(((25.0 - elapsed) * 1000).toLong)
        ss = one(name, fn) :: ss
        // refresh: the SECOND retry's decorrelation window must be
        // measured from the first retry, not from the original battery
        // pass — otherwise back-to-back retries land inside the same
        // steal burst the wait was meant to skip
        measuredAt = System.nanoTime()
        retries += 1
      }
      medians(name) = medOf(ss)
      name -> ss.min
    }.filterNot { case (name, _) => errors.contains(name) }
    def jsonEsc(s: String): String = s.flatMap {
      case '"'            => "\\\""
      case '\\'           => "\\\\"
      case c if c < ' '   => f"\\u${c.toInt}%04x"
      case c              => c.toString
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f4(v) }
      .mkString("{", ",", "}")
    val qsMed = results.map { case (k, _) => s"\"" + k + "\":" + f4(medians(k)) }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + jsonEsc(v) + "\""
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val totalMed =
      if (results.nonEmpty) results.map(r => medians(r._1)).sum else 0.0
    val line = s"""{"metric":"total","value":${f4(total)},"unit":"sec","queries":$qs,"queries_median":$qsMed,"total_median":${f4(totalMed)},"failed":${errors.size},"errors":$errJson,"sf":"$sfDir"}"""
    // The file copy is the complete, machine-readable record regardless
    // of scrape limits, and is written FIRST: if compact-line assembly
    // ever threw (the old id-prefix collision `require`), the whole
    // run's timings must not die with it. Written under BOTH the stable
    // name (what scale_gate knows to read) and an sf-labeled name, so
    // consecutive runs at different SFs don't silently overwrite each
    // other's record.
    System.err.println(line)
    val sfLabel = java.nio.file.Paths.get(sfDir).getFileName.toString
    val outFiles = sys.env.get("SPARK_GRAFT_BENCH_OUT")
      .map(Seq(_))
      .getOrElse(Seq("BENCH_LATEST.json", s"BENCH_LATEST_$sfLabel.json"))
    outFiles.foreach { outFile =>
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outFile), line + "\n")
      catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $outFile: ${e.getMessage}") }
    }
    // The driver's BENCH artifact is json.loads of the LAST 2000 CHARS
    // of raw sbt stdout: the full 148-query line is ~7.8 KB, so every
    // round through r12 recorded "parsed": null (the tail starts
    // mid-JSON). Stdout therefore carries ONE compact line sized under
    // the window: query keys are the id prefix before the first '_'
    // ("x106_ivfpq_recall" -> "x106" — unique across the battery; on a
    // future collision the line falls back to full names and may
    // overflow the window, degrading the scrape but never the run),
    // values at 2 decimals (dropping to 1/0 if a huge-SF run would
    // still overflow), medians and error MESSAGES live only in the file
    // artifact + stderr. Full-name record: BENCH_LATEST[_<sf>].json.
    def compactLine(decimals: Int): String = {
      val shortKeys = results.map { case (k, _) => k.takeWhile(_ != '_') }
      val collide = shortKeys.distinct.size != shortKeys.size
      val pairs =
        if (collide) results
        else results.map { case (k, v) => k.takeWhile(_ != '_') -> v }
      val qsShort = pairs
        .map { case (k, v) => "\"" + k + "\":" + fN(v, decimals) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fN(total, decimals)},"unit":"sec","keys":"id-prefix; full names in BENCH_LATEST file","queries":$qsShort,"total_median":${fN(totalMed, decimals)},"failed":${errors.size},"sf":"$sfDir"}"""
    }
    val scraped = Iterator(2, 1, 0).map(compactLine)
      .find(_.length <= 1900)
      .getOrElse(compactLine(0))
    // Stop Spark BEFORE the scraped line: a sporadic shutdown-time WARN
    // on stdout after the line would re-enter the driver's 2000-char
    // window and break the parse.
    spark.stop()
    // Newline-pad so stdout's final 2000 chars are whitespace + the
    // compact line and nothing else (json.loads tolerates leading
    // whitespace; anything earlier on stdout — Spark warnings, progress
    // noise — is pushed out of the scrape window).
    print("\n" * 2100)
    println(scraped)
    // A bench with ANY failed query must not look like a success to the
    // driver or to gate.sh — rc=0 with failures is how round 7 went blind.
    if (errors.nonEmpty) {
      errors.foreach { case (k, v) => System.err.println(s"BENCH FAIL $k: $v") }
      sys.exit(1)
    }
  }
}
