package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior of the §2.12 custom-operator surface (GraftAsOfJoin +
  * RewriteGraftAsOfJoin) beyond the registry query: mismatched column
  * names between probe and build sides (exercises the rename path in the
  * lowering), unmatched probes, and the payload-collision guard.
  */
class AsOfExtensionSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def probe = Seq(
    (1L, 10L, 100L), (2L, 10L, 205L), (3L, 20L, 50L))
    .toDF("pid", "uid", "t")

  private def build = Seq(
    (10L, 90L, "a"), (10L, 100L, "b"), (10L, 200L, "c"), (30L, 10L, "z"))
    .toDF("user", "at", "tag")

  test("mismatched probe/build column names resolve through the rename path") {
    val out = plans.AsOf.joinBackward(probe, build,
        probeKey = "uid", probeTs = "t", buildKey = "user", buildTs = "at")
      .orderBy(col("pid"))
      .collect()
      .map(r => (r.getLong(0), Option(r.getAs[String]("tag")),
        Option(r.getAs[java.lang.Long]("asof_ts")).map(_.longValue)))
    assert(out === Array(
      (1L, Some("b"), Some(100L)), // inclusive: at == t matches
      (2L, Some("c"), Some(200L)), // latest at-or-before 205
      (3L, None, None)))           // user 20 has no build rows at all
  }

  test("later probe columns keep resolving against the node's output") {
    // references created AFTER the join must survive the rule's re-aliasing
    val out = plans.AsOf.joinBackward(probe, build, "uid", "t", "user", "at")
      .withColumn("lag_us", col("t") - col("asof_ts"))
      .filter(col("tag").isNotNull)
      .orderBy(col("pid"))
      .select(col("pid"), col("lag_us"))
      .as[(Long, Long)].collect()
    assert(out === Array((1L, 0L), (2L, 5L)))
  }

  test("NULL payload in the matched row is NOT replaced by a stale older value") {
    // build rows: (10, 90, 'a') then (10, 200, NULL); probe at t=205 must
    // match the t=200 row and surface its NULL tag — carrying payload
    // columns independently with last(ignoreNulls) would resurrect 'a'
    val b = Seq((10L, 90L, Some("a")), (10L, 200L, None: Option[String]))
      .toDF("user", "at", "tag")
    val out = plans.AsOf.joinBackward(
        probe.filter(col("pid") === 2L), b, "uid", "t", "user", "at")
      .select(col("pid"), col("tag"), col("asof_ts")).collect()
    assert(out.length === 1)
    assert(out(0).getLong(2) === 200L, "must match the t=200 build row")
    assert(out(0).isNullAt(1), "matched row's NULL payload must stay NULL")
  }

  test("misspelled key columns fail fast at construction, not at action time") {
    assertThrows[IllegalArgumentException] {
      plans.AsOf.joinBackward(probe, build, "nope", "t", "user", "at")
    }
    assertThrows[IllegalArgumentException] {
      plans.AsOf.joinBackward(probe, build, "uid", "t", "nope", "at")
    }
  }

  test("payload column colliding with a probe column is rejected") {
    val bad = build.withColumnRenamed("tag", "pid")
    assertThrows[IllegalArgumentException] {
      plans.AsOf.joinBackward(probe, bad, "uid", "t", "user", "at")
    }
  }

  test("property: lowering agrees with a plain-Scala reference on random inputs") {
    val rnd = new scala.util.Random(97)
    for (round <- 1 to 5) {
      val nKeys = 5
      val probes = (1 to 120).map(i =>
        (i.toLong, rnd.nextInt(nKeys).toLong, rnd.nextInt(50).toLong))
      // build rows deduped per (key, ts) — the operator's documented contract
      val builds = (1 to 150).map(_ =>
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(50).toLong))
        .distinct.map { case (u, ts) => (u, ts, s"v$u-$ts") }
      val expected = probes.map { case (pid, u, t) =>
        val m = builds.filter(b => b._1 == u && b._2 <= t)
          .sortBy(_._2).lastOption
        pid -> ((m.map(_._3), m.map(_._2)))
      }.toMap
      val got = plans.AsOf.joinBackward(
          probes.toDF("pid", "uid", "t"), builds.toDF("user", "at", "tag"),
          "uid", "t", "user", "at")
        .collect()
        .map(r => r.getLong(0) -> (Option(r.getAs[String]("tag")),
          Option(r.getAs[java.lang.Long]("asof_ts")).map(_.longValue)))
        .toMap
      probes.foreach { case (pid, _, _) =>
        assert(got(pid) === expected(pid),
          s"round $round probe $pid: got ${got(pid)}, want ${expected(pid)}")
      }
    }
  }

  /** Shared random-input harness for the direction/tolerance variants: the
    * plain-Scala reference picks the candidate per the declared semantics
    * (inclusive bounds, nearest ties to backward, tolerance discards).
    */
  private def variantProperty(
      direction: String, tolerance: Option[Long], seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    for (round <- 1 to 3) {
      val nKeys = 5
      val probes = (1 to 120).map(i =>
        (i.toLong, rnd.nextInt(nKeys).toLong, rnd.nextInt(50).toLong))
      val builds = (1 to 150).map(_ =>
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(50).toLong))
        .distinct.map { case (u, ts) => (u, ts, s"v$u-$ts") }
      def backOf(u: Long, t: Long) = builds
        .filter(b => b._1 == u && b._2 <= t &&
          tolerance.forall(tol => b._2 >= t - tol))
        .sortBy(_._2).lastOption
      def fwdOf(u: Long, t: Long) = builds
        .filter(b => b._1 == u && b._2 >= t &&
          tolerance.forall(tol => b._2 <= t + tol))
        .sortBy(_._2).headOption
      val expected = probes.map { case (pid, u, t) =>
        val m = direction match {
          case "backward" => backOf(u, t)
          case "forward" => fwdOf(u, t)
          case "nearest" =>
            (backOf(u, t), fwdOf(u, t)) match {
              case (Some(b), Some(f)) =>
                if (t - b._2 <= f._2 - t) Some(b) else Some(f)
              case (b, f) => b.orElse(f)
            }
        }
        pid -> ((m.map(_._3), m.map(_._2)))
      }.toMap
      val got = plans.AsOf.join(
          probes.toDF("pid", "uid", "t"), builds.toDF("user", "at", "tag"),
          "uid", "t", "user", "at", direction, tolerance.map(_.toString))
        .collect()
        .map(r => r.getLong(0) -> (Option(r.getAs[String]("tag")),
          Option(r.getAs[java.lang.Long]("asof_ts")).map(_.longValue)))
        .toMap
      probes.foreach { case (pid, _, _) =>
        assert(got(pid) === expected(pid),
          s"$direction/tol=$tolerance round $round probe $pid: " +
            s"got ${got(pid)}, want ${expected(pid)}")
      }
    }
  }

  test("property: forward lowering agrees with a plain-Scala reference") {
    variantProperty("forward", None, seed = 31)
  }

  test("property: nearest lowering agrees with a plain-Scala reference") {
    variantProperty("nearest", None, seed = 53)
  }

  test("property: toleranced backward/forward/nearest agree with the reference") {
    variantProperty("backward", Some(7L), seed = 71)
    variantProperty("forward", Some(7L), seed = 89)
    variantProperty("nearest", Some(7L), seed = 101)
  }

  test("property: composite-key lowering agrees with a plain-Scala reference") {
    // 2-part key (ns, uid) with DIFFERENT names on the build side — the
    // positional pairing must land build key i in probe key i's slot.
    // Includes cross-key collisions: same uid under different ns must NOT
    // match (the bug a single-column partition key would produce).
    val rnd = new scala.util.Random(113)
    for (round <- 1 to 3) {
      val probes = (1 to 150).map(i =>
        (i.toLong, s"ns${rnd.nextInt(3)}", rnd.nextInt(4).toLong,
          rnd.nextInt(40).toLong))
      val builds = (1 to 120).map(_ =>
        (s"ns${rnd.nextInt(3)}", rnd.nextInt(4).toLong, rnd.nextInt(40).toLong))
        .distinct.map { case (ns, u, ts) => (ns, u, ts, s"$ns/$u@$ts") }
      val expected = probes.map { case (pid, ns, u, t) =>
        val m = builds.filter(b => b._1 == ns && b._2 == u && b._3 <= t)
          .sortBy(_._3).lastOption
        pid -> ((m.map(_._4), m.map(_._3)))
      }.toMap
      val got = plans.AsOf.join(
          probes.toDF("pid", "pns", "uid", "t"),
          builds.toDF("bns", "user", "at", "tag"),
          Seq("pns", "uid"), "t", Seq("bns", "user"), "at", "backward", None)
        .collect()
        .map(r => r.getLong(0) -> (Option(r.getAs[String]("tag")),
          Option(r.getAs[java.lang.Long]("asof_ts")).map(_.longValue)))
        .toMap
      probes.foreach { case (pid, _, _, _) =>
        assert(got(pid) === expected(pid),
          s"round $round probe $pid: got ${got(pid)}, want ${expected(pid)}")
      }
    }
  }

  test("composite-key validation: length mismatch and duplicates rejected") {
    assertThrows[IllegalArgumentException] {
      plans.AsOf.join(probe, build, Seq("uid", "pid"), "t", Seq("user"), "at",
        "backward", None)
    }
    assertThrows[IllegalArgumentException] {
      plans.AsOf.join(probe, build, Seq("uid", "uid"), "t", Seq("user", "user"),
        "at", "backward", None)
    }
  }

  test("build ts column named asof_ts is accepted (excluded from payload)") {
    // ADVICE r4: the reserved-name guard must not reject a build side whose
    // TS column is itself asof_ts — it never reaches the payload
    val b = build.withColumnRenamed("at", "asof_ts")
    val out = plans.AsOf.joinBackward(probe, b, "uid", "t", "user", "asof_ts")
      .orderBy(col("pid")).collect()
    assert(out.length === 3)
    assert(Option(out(0).getAs[java.lang.Long]("asof_ts")).map(_.longValue) === Some(100L))
  }

  test("probe column named asof_ts is still rejected (chaining requires rename)") {
    val p = probe.withColumnRenamed("t", "asof_ts")
    assertThrows[IllegalArgumentException] {
      plans.AsOf.joinBackward(p, build, "uid", "asof_ts", "user", "at")
    }
  }

  test("broadcast exec matches the window lowering on edge cases") {
    // ties at equal ts, probe with no build rows, null key/ts probes
    val pr = Seq[(java.lang.Long, java.lang.Long, java.lang.Long)](
      (1L, 10L, 100L), (2L, 10L, 99L), (3L, 10L, 205L), (4L, 20L, 50L),
      (5L, null, 100L), (6L, 10L, null))
      .toDF("pid", "uid", "t")
    val bd = Seq((10L, 90L, "a"), (10L, 100L, "b"), (10L, 200L, "c"),
      (30L, 10L, "z")).toDF("user", "at", "tag")
    def norm(df: org.apache.spark.sql.DataFrame) = df.orderBy(col("pid"))
      .collect().map(r => (r.getLong(0), Option(r.getAs[String]("tag")),
        Option(r.getAs[java.lang.Long]("asof_ts")).map(_.longValue))).toSeq
    val viaWindow = norm(plans.AsOf.joinBackward(pr, bd, "uid", "t", "user", "at"))
    val viaExec = norm(plans.BroadcastAsOf.joinBackwardBroadcast(
      pr, bd, "uid", "t", "user", "at"))
    assert(viaExec == viaWindow)
    assert(viaExec == Seq(
      (1L, Some("b"), Some(100L)), (2L, Some("a"), Some(90L)),
      (3L, Some("c"), Some(200L)), (4L, None, None),
      (5L, None, None), (6L, None, None)))
  }

  test("broadcast exec handles an INT-typed build timestamp (no CCE)") {
    // ADVICE r6: the exec used to store a Long into the asof_ts slot while
    // declaring the build column's own type — an IntegerType build ts made
    // the output projection throw ClassCastException. The slot must carry
    // the declared type.
    val pr = Seq((1L, 10L, 100), (2L, 10L, 99), (3L, 20L, 50))
      .toDF("pid", "uid", "t")
    val bd = Seq((10L, 90, "a"), (10L, 100, "b")).toDF("user", "at", "tag")
    assert(pr.schema("t").dataType === org.apache.spark.sql.types.IntegerType)
    val out = plans.BroadcastAsOf.joinBackwardBroadcast(
        pr, bd, "uid", "t", "user", "at")
      .orderBy(col("pid")).collect()
      .map(r => (r.getLong(0), Option(r.getAs[String]("tag")),
        Option(r.getAs[java.lang.Integer]("asof_ts")).map(_.intValue))).toSeq
    assert(out === Seq(
      (1L, Some("b"), Some(100)), (2L, Some("a"), Some(90)), (3L, None, None)))
  }

  test("broadcast exec composite key matches the window lowering") {
    val pr = Seq(
      (1L, 10L, 0L, 100L), (2L, 10L, 1L, 100L), (3L, 10L, 0L, 80L),
      (4L, 20L, 0L, 100L))
      .toDF("pid", "uid", "seg", "t")
    val bd = Seq(
      (10L, 0L, 90L, "a0"), (10L, 1L, 95L, "a1"), (10L, 0L, 50L, "b0"))
      .toDF("user", "cseg", "at", "tag")
    def norm(df: org.apache.spark.sql.DataFrame) = df.orderBy(col("pid"))
      .collect().map(r => (r.getLong(0), Option(r.getAs[String]("tag")),
        Option(r.getAs[java.lang.Long]("asof_ts")).map(_.longValue))).toSeq
    val viaWindow = norm(plans.AsOf.join(pr, bd,
      Seq("uid", "seg"), "t", Seq("user", "cseg"), "at", "backward", None))
    val viaExec = norm(plans.BroadcastAsOf.joinBackwardBroadcast(
      pr, bd, Seq("uid", "seg"), "t", Seq("user", "cseg"), "at"))
    assert(viaExec == viaWindow)
    assert(viaExec == Seq(
      (1L, Some("a0"), Some(90L)), (2L, Some("a1"), Some(95L)),
      (3L, Some("b0"), Some(50L)), (4L, None, None)))
  }

  test("forward broadcast exec matches the forward window lowering") {
    val pr = Seq[(java.lang.Long, java.lang.Long, java.lang.Long)](
      (1L, 10L, 100L), (2L, 10L, 95L), (3L, 10L, 201L), (4L, 20L, 50L),
      (5L, null, 100L), (6L, 10L, null))
      .toDF("pid", "uid", "t")
    val bd = Seq((10L, 90L, "a"), (10L, 100L, "b"), (10L, 200L, "c"),
      (30L, 10L, "z")).toDF("user", "at", "tag")
    def norm(df: org.apache.spark.sql.DataFrame) = df.orderBy(col("pid"))
      .collect().map(r => (r.getLong(0), Option(r.getAs[String]("tag")),
        Option(r.getAs[java.lang.Long]("asof_ts")).map(_.longValue))).toSeq
    val viaWindow = norm(plans.AsOf.joinForward(pr, bd, "uid", "t", "user", "at"))
    val viaExec = norm(plans.BroadcastAsOf.joinForwardBroadcast(
      pr, bd, "uid", "t", "user", "at"))
    assert(viaExec == viaWindow)
    // at-or-after inclusive: pid 1 probes t=100 and matches ts=100 ("b")
    assert(viaExec == Seq(
      (1L, Some("b"), Some(100L)), (2L, Some("b"), Some(100L)),
      (3L, None, None), (4L, None, None), (5L, None, None), (6L, None, None)))
  }

  test("tolerance broadcast exec nulls matches beyond the max gap") {
    val pr = Seq((1L, 10L, 100L), (2L, 10L, 500L), (3L, 10L, 205L))
      .toDF("pid", "uid", "t")
    val bd = Seq((10L, 90L, "a"), (10L, 200L, "c")).toDF("user", "at", "tag")
    val out = plans.BroadcastAsOf.joinBackwardToleranceBroadcast(
        pr, bd, "uid", "t", "user", "at", toleranceMicros = 50L)
      .orderBy(col("pid")).collect()
      .map(r => (r.getLong(0), Option(r.getAs[String]("tag")),
        Option(r.getAs[java.lang.Long]("asof_ts")).map(_.longValue))).toSeq
    // pid 1: match at 90, gap 10 <= 50 → kept; pid 2: match at 200, gap
    // 300 > 50 → nulled; pid 3: match at 200, gap 5 → kept
    assert(out === Seq(
      (1L, Some("a"), Some(90L)), (2L, None, None), (3L, Some("c"), Some(200L))))
  }

  test("nearest broadcast exec matches the nearest window lowering") {
    val pr = Seq((1L, 10L, 100L), (2L, 10L, 146L), (3L, 10L, 155L),
      (4L, 20L, 50L)).toDF("pid", "uid", "t")
    // backward candidate at 90, forward at 200: pid 2 gap 56 vs 54 →
    // forward; pid 3 gap 65 vs 45 → forward; pid 1 gap 10 vs 100 → back
    val bd = Seq((10L, 90L, "a"), (10L, 200L, "c")).toDF("user", "at", "tag")
    def norm(df: org.apache.spark.sql.DataFrame) = df.orderBy(col("pid"))
      .collect().map(r => (r.getLong(0), Option(r.getAs[String]("tag")),
        Option(r.getAs[java.lang.Long]("asof_ts")).map(_.longValue))).toSeq
    val viaWindow = norm(plans.AsOf.joinNearest(pr, bd, "uid", "t", "user", "at"))
    val viaExec = norm(plans.BroadcastAsOf.joinNearestBroadcast(
      pr, bd, "uid", "t", "user", "at"))
    assert(viaExec == viaWindow)
    assert(viaExec == Seq(
      (1L, Some("a"), Some(90L)), (2L, Some("c"), Some(200L)),
      (3L, Some("c"), Some(200L)), (4L, None, None)))
    // exact tie goes to the at-or-before side
    val tie = norm(plans.BroadcastAsOf.joinNearestBroadcast(
      Seq((9L, 10L, 145L)).toDF("pid", "uid", "t"), bd, "uid", "t", "user", "at"))
    assert(tie == Seq((9L, Some("a"), Some(90L))))
  }

  test("broadcast exec agrees with the window lowering on random data") {
    val rnd = new scala.util.Random(7)
    val pr = (1 to 400).map(i =>
      (i.toLong, rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong))
      .toDF("pid", "uid", "t")
    // pre-deduped per (key, ts): the as-of contract both paths require
    val bd = (1 to 300).map(i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong, s"v$i"))
      .groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toSeq
      .toDF("user", "at", "tag")
    def norm(df: org.apache.spark.sql.DataFrame) = df.orderBy(col("pid"))
      .collect().map(r => (r.getLong(0), Option(r.getAs[String]("tag")),
        Option(r.getAs[java.lang.Long]("asof_ts")).map(_.longValue))).toSeq
    assert(norm(plans.BroadcastAsOf.joinBackwardBroadcast(
        pr, bd, "uid", "t", "user", "at")) ==
      norm(plans.AsOf.joinBackward(pr, bd, "uid", "t", "user", "at")))
  }

}
