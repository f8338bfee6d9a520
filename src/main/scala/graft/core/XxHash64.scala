package graft.core

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform

/** 64-bit URL key hashing.
  *
  * Delegates to Spark's XXH64 (the implementation behind the `xxhash64`
  * Catalyst expression, default seed 42) so that keys computed row-wise in
  * typed code agree bit-for-bit with `xxhash64(col)` columns — the frontier
  * can mix both without re-hashing.
  */
object XxHash64 {
  def hashBytes(bytes: Array[Byte], seed: Long): Long =
    XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, seed)

  def hashUtf8(s: String, seed: Long): Long =
    hashBytes(s.getBytes(StandardCharsets.UTF_8), seed)

  def hashLong(v: Long, seed: Long): Long = XXH64.hashLong(v, seed)
}
