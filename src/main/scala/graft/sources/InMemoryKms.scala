package graft.sources

import org.apache.parquet.crypto.KeyAccessDeniedException
import org.apache.parquet.crypto.keytools.LocalWrapKmsClient

/** In-process KMS for Parquet Modular Encryption (PME): master keys live
  * in this map instead of a key server; [[LocalWrapKmsClient]] does the
  * actual AES key wrapping locally. This is the standard shape for
  * wiring PME to a real KMS — swap [[getMasterKeyFromServer]] for an API
  * call and nothing else changes. Keys are demo constants: the point of
  * the row is the FORMAT-level encryption mechanics (encrypted footer +
  * per-column keys, decryption on scan), not key custody.
  */
class InMemoryKms extends LocalWrapKmsClient {
  override protected def initializeInternal(): Unit = ()

  override protected def getMasterKeyFromServer(masterKeyIdentifier: String): Array[Byte] =
    InMemoryKms.masterKeys.getOrElse(masterKeyIdentifier,
      throw new KeyAccessDeniedException(masterKeyIdentifier))
}

object InMemoryKms {
  /** 16-byte AES master keys by id: footer key + column key. */
  val masterKeys: Map[String, Array[Byte]] = Map(
    "kf" -> "graft-footer-k16".getBytes("UTF-8"),
    "kc" -> "graft-column-k16".getBytes("UTF-8"))
}
