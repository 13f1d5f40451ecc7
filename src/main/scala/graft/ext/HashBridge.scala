package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashes cut from md5 prefixes.
  *
  * Both Spark and DuckDB implement RFC-1321 md5 over UTF-8 bytes and
  * print identical lowercase hex, so any integer cut from the hex
  * string is bit-identical in both engines — unlike xxhash64, which
  * has no DuckDB analog and forced the round-1 sketch queries
  * (minhash/simhash/LSH) down to rows-only correctness checks.
  *
  * Width discipline: 15 hex chars = 60 bits, the widest md5 prefix
  * that is guaranteed non-negative in a signed 64-bit integer on both
  * sides (16 chars could set the sign bit in Spark's long while
  * DuckDB's `::UBIGINT` stays unsigned — a silent sign mismatch).
  * Spark spells the cut `conv(substring(hex, off, len), 16, 10)`;
  * DuckDB spells it `('0x' || substr(hex, off, len))::BIGINT`.
  *
  * xxhash64 remains in use where the REFERENCE uses it (F14 surrogate
  * keys, `/root/reference/spark/load_warehouse.py:109`) and as a
  * shuffle-key compressor where no oracle needs to reproduce it.
  */
object HashBridge {

  /** Top 60 bits of an md5 hex column, as a non-negative long. */
  def md5Bits60(hexCol: Column): Column =
    conv(substring(hexCol, 1, 15), 16, 10).cast("long")

  /** 32 bits of an md5 hex column starting at 1-based hex offset
    * `off` (use 1 and 9 for two independent halves of the top 64). */
  def md5Bits32(hexCol: Column, off: Int): Column =
    conv(substring(hexCol, off, 8), 16, 10).cast("long")

  /** DuckDB spelling of [[md5Bits60]] over an md5(...) SQL expr. */
  def md5Bits60Sql(md5Expr: String): String =
    s"('0x' || substr($md5Expr, 1, 15))::BIGINT"

  /** DuckDB spelling of [[md5Bits32]] over an md5(...) SQL expr. */
  def md5Bits32Sql(md5Expr: String, off: Int): String =
    s"('0x' || substr($md5Expr, $off, 8))::BIGINT"
}
