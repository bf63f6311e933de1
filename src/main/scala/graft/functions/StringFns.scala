package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String helpers mirroring chewdata's tera string filters/functions
  * (reference: src/updater/tera_helpers/filters/string.rs,
  * src/helper/checksum.rs) as native Spark column functions — every one is a
  * built-in expression, codegen'd, zero UDFs.
  */
object StringFns {

  def base64Encode(c: Column): Column = base64(c.cast("binary"))

  def base64Decode(c: Column): Column = unbase64(c).cast("string")

  /** tera `find` filter: first regex match (null when absent). */
  def find(c: Column, pattern: String): Column =
    nullif(regexp_extract(c, pattern, 0), lit(""))

  /** All regex matches. */
  def findAll(c: Column, pattern: String): Column =
    regexp_extract_all(c, lit(pattern), lit(0))

  /** Checksums (chewdata src/helper/checksum.rs supports md5/sha families). */
  def checksumMd5(c: Column): Column    = md5(c.cast("binary"))
  def checksumSha1(c: Column): Column   = sha1(c.cast("binary"))
  def checksumSha256(c: Column): Column = sha2(c.cast("binary"), 256)
  def checksumSha512(c: Column): Column = sha2(c.cast("binary"), 512)
  def checksumCrc32(c: Column): Column  = crc32(c.cast("binary"))

  /** Environment variable as literal (driver-side resolution, like tera's
    * `env` function — the value is fixed at plan time). */
  def env(name: String, default: String = ""): Column =
    lit(sys.env.getOrElse(name, default))

  /** uuid_v4 — nondeterministic per row, like the reference. */
  def uuidV4(): Column = expr("uuid()")

  /** Deterministic slug (lowercase, alnum runs joined by '-'). */
  def slugify(c: Column): Column =
    regexp_replace(regexp_replace(lower(trim(c)), "[^a-z0-9]+", "-"), "(^-)|(-$)", "")
}
