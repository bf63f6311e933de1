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
  */
object Template {

  private val Var = raw"\{\{\s*([A-Za-z0-9_./]+)\s*\}\}".r

  /** Column reference for a variable; dotted/pointer paths descend structs. */
  private def ref(path: String): Column = {
    val parts = path.split("[./]").filter(_.nonEmpty)
    parts.tail.foldLeft(col(parts.head))((c, f) => c.getField(f))
  }

  def render(template: String): Column = {
    val pieces = scala.collection.mutable.ArrayBuffer.empty[Column]
    var last = 0
    for (m <- Var.findAllMatchIn(template)) {
      if (m.start > last) pieces += lit(template.substring(last, m.start))
      pieces += ref(m.group(1)).cast("string")
      last = m.end
    }
    if (last < template.length) pieces += lit(template.substring(last))
    if (pieces.isEmpty) lit("") else concat(pieces.toSeq: _*)
  }

  /** Variables referenced by a template (for dependency pruning). */
  def variables(template: String): Seq[String] =
    Var.findAllMatchIn(template).map(_.group(1)).toSeq
}
