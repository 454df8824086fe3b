package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entry point. Prints per-query timings (one long JSON line) and
  * then a SHORT `{"metric":"total",...}` JSON object on its own, final line —
  * the driver captures the tail of stdout, so the parseable summary must be
  * last (a 140-query map pushed the metric prefix out of the captured tail in
  * rounds 1–2). Because even the tail-most detail line overflowed the driver's
  * capture window at 181 queries (BENCH_r04 `tail` starts mid-dict), the full
  * detail map is ALSO persisted to `BENCH_DETAIL.json` in the working
  * directory so round-over-round per-query comparison survives the artifact.
  *
  * Timing protocol (r9): queries run in sorted-name order (Map hash order
  * changed per round, making per-query deltas incomparable), each query
  * runs THREE times; batch rows report the MIN (first pass absorbs janino
  * codegen + shuffle warmup; one contended run can never set the number),
  * `stream_*` rows report the MEDIAN (their micro-batch machinery swings
  * both ways). Min-of-2 plus a noisy-query allowlist proved insufficient:
  * the round-6 AND round-8 verdicts each found a cluster of unchanged
  * queries timing 2–7.6× slower from shared-JVM contention alone.
  *
  * Failures are counted, not swallowed: a query that throws contributes its
  * elapsed time and is listed in the `failed` field of the total line, so a
  * breaking query deflates neither silently nor invisibly.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // optional args: run only these queries (isolated re-bench mode — the
    // r6→r7 regression adjudication tool; the driver passes no args)
    val only = args.toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // one-time sweep of scratch dirs left by pre-round-3 runs (before the
    // runRoot shutdown hook existed) so long-lived sandboxes stay tidy
    util.sweepStaleScratch()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // install the engine's native functions (cosine_sim) at session build
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/session warmup (codegen, shuffle machinery) so first-query
    // timing reflects the query, not session init
    spark.range(1000000).selectExpr("sum(id)").collect()
    // (elapsed seconds, succeeded?)
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    // r8 verdict #1: EVERY query now runs three times — the round-6 and
    // round-8 verdicts both flagged a "noise cluster" of unchanged queries
    // timing 2–7.6× slower (r7 isolation re-bench proved shared-JVM GC /
    // disk contention, e.g. join_range_interval 2.63 s → 0.43 s), so
    // min-of-2 with a per-query allowlist was structurally unable to keep
    // round-over-round deltas meaningful. Batch rows report MIN-of-3
    // (steady-state plan cost is the signal; one contended run can never
    // set the number); stream_* rows report MEDIAN-of-3 (their micro-batch
    // machinery swings BOTH ways — a lucky fast run is as misleading as a
    // contended slow one).
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      val runs = Seq(time(fn), time(fn), time(fn)).sortBy(_._1)
      val rep = if (name.startsWith("stream_")) runs(1) else runs.head
      val ok = runs.forall(_._2)
      (name, rep._1, ok)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
    val detail = s"""{"metric":"detail","queries":$qs,"sf":"$sfDir","failed":[${failed.mkString(",")}]}"""
    // committed artifact: the full per-query map survives even when the
    // driver's stdout tail capture truncates the detail line. Subset
    // (isolation-mode) runs must not clobber the full-run artifact.
    if (only.isEmpty) java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_DETAIL.json"),
      detail.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(detail)
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_failed":${failed.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
