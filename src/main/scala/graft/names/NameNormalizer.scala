package graft.names

/**
 * Identifier normalization for table and top-level column names.
 *
 * Semantics derived from the reference implementation
 * (PyAirbyte `airbyte/_util/name_normalizers.py:48-87`,
 * `airbyte/_processors/sql/postgres.py:41-56`):
 *   - lowercase
 *   - every non-alphanumeric character becomes `_`
 *   - prepend `_` if the name starts with a digit
 *   - error if the result is empty (or only underscores derived from an
 *     all-invalid-character input that normalizes to nothing meaningful)
 *   - optional max-length truncation (Postgres truncates at 63 chars)
 *
 * Applied to table identifiers and *top-level* column names only — nested
 * JSON keys are intentionally left untouched
 * (reference: `airbyte/records.py:9-36`).
 *
 * Pure function; safe to call on driver or inside expressions.
 */
object NameNormalizer {

  final case class InvalidNameException(name: String)
      extends IllegalArgumentException(
        s"Name cannot be empty after normalization: ${name.trim}")

  /** Lower-case normalizer, the reference default. */
  def normalize(name: String): String = {
    val sb = new StringBuilder(name.length + 1)
    val trimmed = name.trim
    var i = 0
    while (i < trimmed.length) {
      val c = trimmed.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (c >= 'A' && c <= 'Z') sb.append((c + 32).toChar)
      else sb.append('_')
      i += 1
    }
    val base = sb.toString
    val prefixed =
      if (base.nonEmpty && base.charAt(0) >= '0' && base.charAt(0) <= '9')
        "_" + base
      else base
    if (prefixed.isEmpty || !prefixed.exists(c => c != '_'))
      throw InvalidNameException(name)
    prefixed
  }

  /** Postgres-style variant: normalize then truncate to `maxLength`. */
  def normalizeTruncated(name: String, maxLength: Int = 63): String = {
    val n = normalize(name)
    if (n.length > maxLength) n.substring(0, maxLength) else n
  }

  /** Normalization that returns None instead of throwing. */
  def normalizeOpt(name: String): Option[String] =
    try Some(normalize(name))
    catch { case _: InvalidNameException => None }

  /**
   * Case-insensitive equality as used for column resolution.
   * Mirrors the reference's case-insensitive record keys
   * (`airbyte/records.py:259-297`); in Spark queries this is the default
   * (`spark.sql.caseSensitive=false`), this helper is for driver-side
   * catalog code.
   */
  def eq(a: String, b: String): Boolean = a.equalsIgnoreCase(b)
}
