package graft.sources

import org.apache.parquet.crypto.keytools.LocalWrapKmsClient

/** Deterministic in-process KMS for parquet modular encryption
  * (sink_encrypted_roundtrip): master keys are derived from the key
  * identifier by md5, so any session in this environment can decrypt
  * what any other wrote — the stand-in for the organization's real
  * KMS endpoint, exactly at the seam parquet-mr designed for it
  * (KmsClient is the pluggable class; LocalWrapKmsClient gives
  * local envelope wrapping, so the "KMS" is contacted once per
  * master key, not per file — the 100 TB access pattern).
  * Production swaps this class name in
  * `parquet.encryption.kms.client.class` for the vault-backed one;
  * nothing else in the write or read path changes. */
class GraftKms extends LocalWrapKmsClient {
  override protected def getMasterKeyFromServer(masterKeyIdentifier: String): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5")
      .digest(("graft-master-" + masterKeyIdentifier).getBytes("UTF-8"))
  override protected def initializeInternal(): Unit = ()
}
