package graft.tools

import org.apache.spark.sql.SparkSession

/** Multi-process execution smoke (VERDICT r9 #1).
  *
  * Every scale claim through round 9 was measured inside ONE JVM
  * (`local[32]`), where three classes of bug are structurally invisible:
  *
  *  1. closure serialization — the multimodal codec legs
  *     (`mapPartitions` over `javax.imageio` / `javax.sound.sampled`
  *     decoders, `graft/ops/Extensions.scala`) capture state that only
  *     has to be `Serializable` once a task ships to a separate executor;
  *  2. the custom [[graft.plans.BroadcastAsOfJoin]] physical operator —
  *     its build-side index travels through a custom `BroadcastMode` and
  *     is memoized per-executor; in `local[n]` the "broadcast" never
  *     leaves the driver's heap;
  *  3. the manifest sink's two-phase commit + WAP branches
  *     (`graft/sources/ManifestSink.scala`) — task attempts write from
  *     executor JVMs while the driver publishes the manifest; single-JVM
  *     runs can never catch a path or visibility assumption that holds
  *     only driver-side.
  *
  * `local-cluster[2,16,2048]` is Spark's offline answer: a real
  * standalone master + 2 worker processes, each forking a 16-core /
  * 2 GiB executor JVM, with the application jar shipped via
  * `spark.jars`. Launch with `spark-submit` so the jar distribution and
  * master URL are wired the standard way:
  *
  * {{{
  * /opt/spark/bin/spark-submit \
  *   --master 'local-cluster[2,16,2048]' \
  *   --conf spark.sql.extensions=graft.GraftExtensions \
  *   --class graft.tools.LocalClusterSmoke \
  *   target/scala-2.13/canvasdata2awsspark_2.13-0.1.0.jar
  * }}}
  *
  * Runs the rows the round-9 verdict called out (stream-stream joins, the
  * full transformWithState tier, the three multimodal codec legs, every
  * broadcast as-of variant, MaxSim, the lifecycle composites and the
  * commit-protocol sinks) once each at sf0.01, prints one JSON line per
  * query and a final summary line. Any exception is a smoke FAILURE —
  * recorded with the exception head, never swallowed.
  */
object LocalClusterSmoke {

  /** The 31 rows whose mechanisms have never crossed a process boundary. */
  val targets: Seq[String] = Seq(
    // stream-stream joins + full typed-state tier + restart/commit machinery
    "stream_stream_join", "stream_stream_join_outer", "stream_stream_semi_join",
    "stream_tws_initial_state", "stream_tws_liststate", "stream_tws_mapstate",
    "stream_tws_timers", "stream_transform_with_state", "stream_state_reader_tws",
    "stream_restart_recovery", "stream_exactly_once_sink", "stream_wap_branch",
    // multimodal codec legs (closure-serialized decoders)
    "multimodal_image_phash", "multimodal_resize", "multimodal_frame_sample",
    "multimodal_audio_energy", "multimodal_audio_vad",
    "multimodal_binary_pipeline", "multimodal_tar_index",
    // custom broadcast as-of exec (custom BroadcastMode + executor memo)
    "join_asof_broadcast_exec", "join_asof_forward_broadcast",
    "join_asof_multikey_broadcast", "join_asof_nearest_broadcast",
    "join_asof_tolerance_broadcast",
    // fused codegen kernels + salted shuffle near-dup
    "sim_maxsim_ivf_pruned", "sim_maxsim_late_interaction",
    "text_neardup_simhash",
    // lifecycle composites + commit-protocol sinks
    "pipeline_training_mix", "pipeline_dap_replica",
    "sink_custom_commit", "sql_merge_into")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    graft.util.sweepStaleScratch()
    // no .master() here: spark-submit supplies it (local-cluster[...]),
    // and overriding from code would silently fall back to single-JVM —
    // defeating the entire point of this smoke
    val spark = SparkSession.builder()
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    require(spark.sparkContext.master.startsWith("local-cluster"),
      s"smoke must run multi-process, got master=${spark.sparkContext.master}")
    // wait for both executors to register so tasks actually distribute
    val deadline = System.currentTimeMillis() + 60000
    while (spark.sparkContext.getExecutorMemoryStatus.size < 3 &&
      System.currentTimeMillis() < deadline) Thread.sleep(500)
    val execs = spark.sparkContext.getExecutorMemoryStatus.size - 1
    println(s"""{"executors":$execs}""")

    val registry = graft.SparkEntry.queries
    // args mode runs ANY registry rows by name; `--all` sweeps the whole
    // registry (sorted) — the full-engine multi-process certification
    val names =
      if (args.sameElements(Array("--all"))) registry.keys.toSeq.sorted
      else if (args.nonEmpty) args.toSeq
      else targets
    var failed = List.empty[String]
    val rows = names.map { name =>
      val t0 = System.nanoTime()
      val res =
        try { registry(name)(spark, sfDir).count(); "ok" }
        catch {
          case e: Throwable =>
            failed ::= name
            val head = (e.getClass.getSimpleName + ": " +
              String.valueOf(e.getMessage).takeWhile(_ != '\n').take(160))
              .replace("\"", "'")
            s"fail $head"
        }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"q":"$name","sec":$sec%.2f,"status":"$res"}""")
      (name, sec, res)
    }
    val total = rows.map(_._2).sum
    println(f"""{"metric":"local_cluster_smoke","queries":${rows.size},"failed":${failed.size},"failed_names":[${failed.reverse.map("\"" + _ + "\"").mkString(",")}],"total_sec":$total%.1f,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
