package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Object (map/struct) helpers mirroring chewdata's tera object filters
  * (reference: src/updater/tera_helpers/filters/object.rs — merge, search,
  * replace_key, replace_value, extract, update, map, keys, values).
  *
  * chewdata records are free-form JSON objects; the Spark-native shape is a
  * `MapType(string, string)` column for the dynamic part. All helpers are
  * built-in higher-order functions — codegen-eligible, no UDFs, safe inside
  * a 100 TB scan.
  */
object ObjectFns {

  /** merge: right-hand entries win on key conflict (tera `merge(with=...)`). */
  def merge(a: Column, b: Column): Column =
    map_filter(map_concat(map_filter(a, (k, _) => !map_contains_key(b, k)), b),
      (_, v) => v.isNotNull)

  /** keys / values (sorted keys for deterministic output). */
  def keys(m: Column): Column   = array_sort(map_keys(m))
  def values(m: Column): Column = map_values(m)

  /** replace_key: rename keys matching `from` to `to`. */
  def replaceKey(m: Column, from: String, to: String): Column =
    map_from_entries(transform(map_entries(m),
      e => struct(
        when(e.getField("key") === from, lit(to)).otherwise(e.getField("key")).as("key"),
        e.getField("value").as("value"))))

  /** replace_value: substitute values equal to `from` with `to`. */
  def replaceValue(m: Column, from: Column, to: Column): Column =
    transform_values(m, (_, v) => when(v === from, to).otherwise(v))

  /** update: set/overwrite one key. */
  def update(m: Column, key: String, value: Column): Column =
    merge(m, map(lit(key), value))

  /** remove a key. */
  def remove(m: Column, key: String): Column =
    map_filter(m, (k, _) => k =!= key)

  /** extract: keep only the listed keys (tera `extract(fields=[...])`). */
  def extract(m: Column, fields: Seq[String]): Column =
    map_filter(m, (k, _) => k.isin(fields.map(x => x: Any): _*))

  /** search: keep entries whose key starts with the prefix (tera `search`
    * walks a path prefix through the object). */
  def search(m: Column, prefix: String): Column =
    map_filter(m, (k, _) => k.startsWith(prefix))

  /** map: apply an expression to every value (tera `map(attribute=...)`). */
  def mapValues(m: Column, f: Column => Column): Column =
    transform_values(m, (_, v) => f(v))
}
