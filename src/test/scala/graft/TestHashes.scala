package graft

/** Independent md5-prefix reference gates shared by the parity tests —
  * one copy of each rule, so a change to the engine-side hash family
  * must be reconciled here once instead of hunted across stale
  * duplicates (four copies had accreted across PipelineSpec and
  * PropertySpec).
  */
object TestHashes {
  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** `hashedLinearScore`'s ±1 token weight: md5 first-4-hex parity. */
  def tokenWeight(t: String): Long =
    if (java.lang.Long.parseLong(md5Hex(t).take(4), 16) % 2 == 0) 1L else -1L

  /** `greedyPack`'s shard gate: md5 first-4-hex of the id, mod shards. */
  def shardOf(id: Long, shards: Int): Int =
    (java.lang.Long.parseLong(md5Hex(id.toString).take(4), 16) % shards).toInt

  /** `domainMixture`'s sampling bucket: md5 first-4-hex of the id, mod
    * 10000 (the first two digest bytes).
    */
  def bucket(id: Long): Long =
    java.lang.Long.parseLong(md5Hex(id.toString).take(4), 16) % 10000
}
