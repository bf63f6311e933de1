package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Mustache/tera-style template rendering compiled to a `concat` of column
  * references and literals (reference: src/helper/mustache.rs and the tera
  * pattern strings in src/step/transformer.rs).
  *
  * `render("{{ first }}.{{ last }}@{{ domain }}")` becomes
  * `concat(col("first"), lit("."), col("last"), lit("@"), col("domain"))` —
  * a plan-time compilation, so per-row evaluation is pure codegen'd concat,
  * never a template-engine interpreter in the row loop (which is what makes
  * it survive a 100 TB scan).
  *
  * Filters compose tera-style: `{{ name | trim | upper }}`. The `input.` /
  * `output.` context prefixes of chewdata patterns resolve to the current
  * row (steps are column transformations here, so input ≡ output ≡ row).
  */
object Template {

  private val Var = raw"\{\{\s*([^}]+?)\s*\}\}".r

  /** Supported tera filters → Column transforms. */
  val filters: Map[String, Column => Column] = Map(
    "upper" -> upper _,
    "lower" -> lower _,
    "trim" -> trim _,
    "capitalize" -> initcap _,
    "title" -> initcap _,
    "length" -> (c => length(c).cast("string")),
    "slugify" -> StringFns.slugify _,
    "base64_encode" -> StringFns.base64Encode _,
    "base64_decode" -> StringFns.base64Decode _,
    "md5" -> StringFns.checksumMd5 _,
    "sha256" -> StringFns.checksumSha256 _,
    "json_encode" -> (c => to_json(struct(c))),
    "first" -> (c => element_at(split(c, ","), 1)),
    "last" -> (c => element_at(split(c, ","), -1)))

  /** Column reference for a variable; dotted/pointer paths descend structs.
    * `input.` / `output.` context prefixes map to the current row. */
  private def ref(path: String): Column = {
    val parts = path.split("[./]").filter(_.nonEmpty) match {
      case Array("input" | "output", rest @ _*) if rest.nonEmpty => rest.toArray
      case p => p
    }
    parts.tail.foldLeft(col(parts.head))((c, f) => c.getField(f))
  }

  /** Compile one `{{ ... }}` body: variable path + optional filter chain. */
  private def compileExpr(body: String): Column = {
    val parts = body.split("\\|").map(_.trim).filter(_.nonEmpty)
    val base = ref(parts.head)
    parts.tail.foldLeft(base) { (c, f) =>
      val name = f.takeWhile(ch => ch != '(').trim
      filters.get(name) match {
        case Some(fn) => fn(c)
        case None => throw new IllegalArgumentException(
          s"unsupported template filter: $name (supported: ${filters.keys.toSeq.sorted.mkString(", ")})")
      }
    }
  }

  def render(template: String): Column = {
    val pieces = scala.collection.mutable.ArrayBuffer.empty[Column]
    var last = 0
    for (m <- Var.findAllMatchIn(template)) {
      if (m.start > last) pieces += lit(template.substring(last, m.start))
      pieces += compileExpr(m.group(1)).cast("string")
      last = m.end
    }
    if (last < template.length) pieces += lit(template.substring(last))
    if (pieces.isEmpty) lit("") else concat(pieces.toSeq: _*)
  }

  /** Variables referenced by a template (for dependency pruning). */
  def variables(template: String): Seq[String] =
    Var.findAllMatchIn(template)
      .map(_.group(1).split("\\|").head.trim)
      .toSeq
}
