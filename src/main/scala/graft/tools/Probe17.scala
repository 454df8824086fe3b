package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (round 17, guide §1): time the internal stages of the
  * multi-stage rows under optimization — label each stage as a job and
  * print per-stage seconds, so the optimization targets the measured
  * stage, not a guess.
  *
  * Usage: java -cp ... graft.tools.Probe17 <sfDir> <cpus> <probe> [reps]
  */
object Probe17 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = args(1)
    val probe = args(2)
    val reps = if (args.length > 3) args(3).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      spark.sparkContext.setJobDescription(label)
      val r = body
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.sparkContext.setJobDescription(null)
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    (1 to reps).foreach { rep =>
      println(s"--- rep $rep ---")
      probe match {
        case "training_mix" => trainingMix(spark, sfDir, t, noop)
        case "recall_eval"  => recallEval(spark, sfDir, t, noop)
        case "replica"      => replica(spark, sfDir, t)
        case other          => sys.error(s"unknown probe $other")
      }
    }
    spark.stop()
  }

  /** Stage split of pipeline_training_mix. */
  private def trainingMix(s: SparkSession, dir: String,
      t: String => (=> Unit) => Unit, noop: DataFrame => Unit): Unit = {
    import graft.Tables
    import org.apache.spark.sql.expressions.Window
    val toksM = split(col("text"), " ")
    val stopArr = array(Seq("the", "and", "of", "a", "to", "in", "is").map(lit): _*)
    val scored = Tables(s, dir, "documents")
      .withColumn("n_tokens", size(toksM).cast("long"))
      .withColumn("stop_hits",
        size(filter(toksM, x => array_contains(stopArr, x))).cast("long"))
      .withColumn("q_int",
        least(col("n_tokens"), lit(80L)) * 100 + least(col("stop_hits"), lit(10L)) * 50)
      .filter(col("q_int") >= 3000)
    t("score+gate (noop)")(noop(scored.select("doc_id", "q_int")))
    val keepers = scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(sha2(lower(trim(col("text"))), 256))
          .orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("n_tokens"), col("q_int"))
      .localCheckpoint(false)
    t("keepers checkpoint materialize")(keepers.count())
    val probe = keepers.select(col("source"),
      explode(array(col("n_chars") - 1, col("n_chars"), col("n_chars") + 1)).as("nc"),
      col("doc_id").as("src"))
    val build = keepers.select(col("source"), col("n_chars").as("nc"),
      col("doc_id").as("dst"))
    val edges = probe.join(build, Seq("source", "nc"))
      .filter(col("src") =!= col("dst")).select(col("src"), col("dst"))
    t("edges (noop)")(noop(edges))
    var comp: DataFrame = null
    t("connectedComponents loop") {
      comp = graft.ops.Graph.connectedComponents(keepers.select(col("doc_id")), edges)
    }
    val reps = keepers.join(comp, "doc_id").filter(col("doc_id") === col("comp"))
    val order = Window.partitionBy(col("lang"))
      .orderBy(col("q_int").desc, col("doc_id").asc)
    t("budget fill + final (count)")(
      reps
        .withColumn("cum_before", coalesce(
          sum(col("n_tokens")).over(order.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .filter(col("cum_before") < 3000)
        .count())
  }

  /** Stage split of dedup_minhash_recall_eval. */
  private def recallEval(s: SparkSession, dir: String,
      t: String => (=> Unit) => Unit, noop: DataFrame => Unit): Unit = {
    import graft.Tables
    import graft.text.MinHash
    val docs = Tables(s, dir, "documents")
    val grams = graft.util.fanout(docs.select(col("doc_id"), col("source"), col("text")))
      .select(col("doc_id"), col("source"), MinHash.tokenCrcs(col("text")).as("crcs"))
      .select(col("doc_id"), col("source"),
        explode(MinHash.shingleHashes(col("crcs"), 3, distinct = true, modP = false))
          .as("gram"))
      .localCheckpoint(false)
    t("grams checkpoint materialize")(grams.count())
    val sizes = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    val a = grams.select(col("source"), col("doc_id").as("doc_a"), col("gram"))
    val b = grams.select(col("source"), col("doc_id").as("doc_b"), col("gram"))
    val truth = a.join(b, Seq("source", "gram")).filter(col("doc_a") < col("doc_b"))
      .groupBy(col("source"), col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("common"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_grams").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_grams").as("nb")), "doc_b")
      .filter(col("common").cast("double") /
        (col("na") + col("nb") - col("common")) >= 0.35)
      .select(col("source"), col("doc_a"), col("doc_b"))
    t("truth leg (noop)")(noop(truth))
    var cand: DataFrame = null
    t("cand leg (nearDupPairs, checkpointed)") {
      cand = MinHash.nearDupPairs(docs, "doc_id", "text",
        k = 16, bands = 8, minEstJaccard = 0.2, portable = true)
        .select(col("doc_a"), col("doc_b"))
    }
    t("join + final agg (count)")(
      truth.join(cand.withColumn("hit", lit(1)), Seq("doc_a", "doc_b"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_truth"), count(col("hit")).as("n_hits"))
        .count())
  }

  /** Stage split of pipeline_replica_suite's poll loop. */
  private def replica(s: SparkSession, dir: String,
      t: String => (=> Unit) => Unit): Unit = {
    import graft.Tables
    val scratch = graft.util.tempDir("graft_probe17_")
    def epochDay(c: org.apache.spark.sql.Column) =
      datediff(c.cast("date"), to_date(lit("1970-01-01"))).cast("long")
    val orders = Tables(s, dir, "orders")
    val customer = Tables(s, dir, "customer")
    val ordersFeed = Tables(s, dir, "orders")
      .withColumn("commit_day", epochDay(col("o_orderdate")))
    val lineFeed = Tables(s, dir, "lineitem").join(
      orders.select(col("o_orderkey").as("l_orderkey"),
        epochDay(col("o_orderdate")).as("commit_day")),
      Seq("l_orderkey"))
    val watermarks = Seq("1997-01-01", "1999-01-01", "2002-01-01")
      .map(d => java.time.LocalDate.parse(d).toEpochDay)
    val feeds = Seq("orders" -> ordersFeed, "lineitem" -> lineFeed)
    val cursors = feeds.map { case (tn, _) =>
      tn -> new graft.cdc.Cursor(s"$scratch/cursor_$tn") }.toMap
    t("customer snapshot write")(
      customer.write.mode("overwrite").parquet(s"$scratch/replica/customer"))
    t("customer count")(s.read.parquet(s"$scratch/replica/customer").count())
    watermarks.zipWithIndex.foreach { case (w, r) =>
      val deliveries = if (r == 1) Seq(0, 1) else Seq(0)
      deliveries.zipWithIndex.foreach { case (_, d) =>
        feeds.foreach { case (tn, feed) =>
          val since = cursors(tn).read().getOrElse(Long.MinValue)
          t(s"r$r d$d append $tn")(
            feed.filter(col("commit_day") > since && col("commit_day") <= w)
              .drop("commit_day")
              .write.mode("append").parquet(s"$scratch/replica/$tn"))
          cursors(tn).advance(w)
        }
      }
      feeds.foreach { case (tn, _) =>
        t(s"r$r count $tn")(
          s.read.parquet(s"$scratch/replica/$tn").count())
      }
    }
    val oRep = s.read.parquet(s"$scratch/replica/orders")
    val lRep = s.read.parquet(s"$scratch/replica/lineitem")
    val cRep = s.read.parquet(s"$scratch/replica/customer")
    t("audit anti-join lineitem->orders")(
      lRep.join(oRep.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti").count())
    t("audit anti-join orders->customer")(
      oRep.join(cRep.select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti").count())
    graft.util.deleteRecursively(java.nio.file.Paths.get(scratch))
  }
}
