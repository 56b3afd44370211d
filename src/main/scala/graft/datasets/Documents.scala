package graft.datasets

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/**
 * LLM document rendering: rows → markdown documents with YAML
 * frontmatter, title, and content sections.
 *
 * Mirrors the reference's `DocumentRenderer`
 * (`airbyte/_util/document_rendering.py:37-95`; surface
 * `airbyte/datasets/_base.py:57-79` `to_documents`):
 *  - title from the title property (or the primary key values)
 *  - listed content properties become H2 sections
 *  - metadata properties render as YAML frontmatter
 *  - `render_metadata` toggles frontmatter for single-content docs
 *
 * Implemented as one codegen'd `concat` projection — a pure map over the
 * scan, no UDF, no shuffle; scales linearly with the table.
 */
object Documents {

  final case class Document(id: String, content: String)

  private def titleCase(c: Column): Column = initcap(regexp_replace(c, "_", " "))

  /**
   * Render each row to a markdown document.
   *
   * @param titleCol    column used for the H1 title
   * @param contentCols columns rendered as H2 sections
   * @param metadataCols columns rendered as YAML frontmatter
   */
  def render(
      df: DataFrame,
      titleCol: String,
      contentCols: Seq[String],
      metadataCols: Seq[String] = Seq.empty,
      renderMetadata: Boolean = false): Dataset[Document] = {
    implicit val enc: Encoder[Document] = Encoders.product[Document]

    val frontmatter: Seq[Column] =
      if (metadataCols.nonEmpty && (renderMetadata || contentCols.size > 1))
        Seq(lit("---\n")) ++
          metadataCols.map(m =>
            concat(lit(s"$m: "), coalesce(col(m).cast("string"), lit("null")), lit("\n"))) ++
          Seq(lit("---\n"))
      else Seq.empty

    val title = Seq(concat(lit("# "),
      coalesce(col(titleCol).cast("string"), lit("")), lit("\n\n")))

    val sections = contentCols.map { c =>
      concat(lit("## "), titleCase(lit(c)), lit("\n\n"),
        coalesce(col(c).cast("string"), lit("")), lit("\n\n"))
    }

    df.select(
        col(titleCol).cast("string").as("id"),
        concat((frontmatter ++ title ++ sections): _*).as("content"))
      .as[Document]
  }
}
