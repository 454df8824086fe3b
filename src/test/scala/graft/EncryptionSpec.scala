package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parquet Modular Encryption properties the oracle row can't show: the
  * landed files really are encrypted (PARE footer magic, not PAR1), and a
  * reader without keys fails hard instead of returning garbage.
  */
class EncryptionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val scoped = Map(
    "parquet.crypto.factory.class" ->
      "org.apache.parquet.crypto.keytools.PropertiesDrivenCryptoFactory",
    "parquet.encryption.kms.client.class" -> "graft.sources.InMemoryKms")

  private def withCrypto[T](body: => T): T = {
    val hc = spark.sparkContext.hadoopConfiguration
    val saved = scoped.keys.map(k => k -> Option(hc.get(k))).toMap
    try { scoped.foreach { case (k, v) => hc.set(k, v) }; body }
    finally saved.foreach { case (k, vo) => vo.fold(hc.unset(k))(v => hc.set(k, v)) }
  }

  private def writeEncrypted(): String = {
    val dir = util.tempDir("graft_enc_spec_")
    withCrypto {
      Seq((1L, "alice", 10.5), (2L, "bob", -3.25)).toDF("k", "name", "bal")
        .coalesce(1).write
        .option("parquet.encryption.footer.key", "kf")
        .option("parquet.encryption.column.keys", "kc:name,bal")
        .mode("overwrite").parquet(dir)
    }
    dir
  }

  test("landed files carry the encrypted-footer magic (PARE, not PAR1)") {
    val dir = writeEncrypted()
    val f = Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq.head
    val bytes = Files.readAllBytes(f)
    assert(new String(bytes.takeRight(4), "US-ASCII") == "PARE")
    assert(new String(bytes.take(4), "US-ASCII") == "PARE")
  }

  test("reading without keys fails hard; with keys the data round-trips") {
    val dir = writeEncrypted()
    val noKeys = intercept[Throwable] {
      spark.read.parquet(dir).collect()
    }
    // any of the crypto exceptions qualifies — the point is NOT garbage
    assert(noKeys.toString.toLowerCase.contains("crypto") ||
      Option(noKeys.getCause).exists(_.toString.toLowerCase.contains("crypto")),
      s"unexpected failure: $noKeys")
    val got = withCrypto { spark.read.parquet(dir).orderBy("k").collect() }
    assert(got.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "alice", 10.5), (2L, "bob", -3.25)))
  }
}
