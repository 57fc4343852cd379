package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Row-normalization rules as Column expressions (reference:
  * `normalize_value` [consumer_to_file.py:88-113] — interpreted Python per
  * value; here every rule is a codegen'd expression, vectorized for free).
  *
  * Faithful rules:
  *  - numbers > 1e12 are treated as epoch-millis and floored to seconds
  *    [92-93] — applied to *any* large number, column-independent;
  *  - booleans become 0/1 [94-95];
  *  - strings that already contain JSON objects/arrays pass through raw
  *    [100-107]; structured values are JSON-serialized [108-109].
  *
  * Documented divergences (SURVEY.md §7.1):
  *  - the reference erases NULL to '' [90-91]; we keep real nulls by
  *    default and offer [[legacyNullToEmpty]] for bug-compatible behavior;
  *  - the reference's catch-all stringifies any normalization failure as
  *    the literal `"[ERROR: {e}]"` and keeps it IN the data [112-113]; the
  *    engine's DLQ routing supersedes that (failures are quarantined with
  *    column blame, [[Envelope.dlqWithBlame]], never smuggled into the
  *    table), and [[legacyErrorString]] is the opt-in mirror for
  *    pipelines that want the reference's in-band sentinel.
  */
object Normalize {

  /** Epoch-millis heuristic: any numeric magnitude > 1e12 is ms → s.
    * Boundary faithful to the reference: strictly greater than 1e12. */
  def epochMillisHeuristic(c: Column): Column =
    when(c > lit(1e12), floor(c / 1000)).otherwise(c)

  /** Column-name variant used at table creation: columns ending `_on` with
    * values > 1e12 are DateTime (reference ensure_table [137-138]). */
  def isEpochMillisColumn(name: String, sampleOver1e12: Column): Column =
    if (name.endsWith("_on")) sampleOver1e12 > lit(1e12) else lit(false)

  /** bool → 0/1 (reference [94-95]). */
  def boolToInt(c: Column): Column = c.cast("int")

  /** Reference-compatible null erasure (opt-in; lossy by design there). */
  def legacyNullToEmpty(c: Column): Column = coalesce(c.cast("string"), lit(""))

  /** Reference-compatible error stringification (opt-in, mirrors
    * [[legacyNullToEmpty]]): where a normalization produced null from a
    * NON-null raw value — the expression-world signature of a failed
    * conversion — emit the reference's in-band `"[ERROR: …]"` sentinel
    * [consumer_to_file.py:112-113] instead. The message carries the raw
    * value rather than a Python exception string (there is none here);
    * the sentinel prefix is the compatible part. Default pipelines should
    * prefer DLQ routing — a sentinel string in a typed column is exactly
    * the data-corruption mode a DLQ exists to prevent. */
  def legacyErrorString(raw: Column, normalized: Column): Column =
    when(raw.isNotNull && normalized.isNull,
      concat(lit("[ERROR: "), raw.cast("string"), lit("]")))
      .otherwise(normalized.cast("string"))

  /** A string is "already JSON" when it parses as an object/array —
    * such strings pass through untouched (reference [100-107]).
    * `try_parse_json`-style check via get_json_object on a root probe. */
  def looksLikeJson(c: Column): Column =
    c.rlike("^\\s*[\\[{]") && from_json(c, org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType,
      org.apache.spark.sql.types.StringType)).isNotNull

  /** Bytes → UTF-8 text with replacement (reference decode errors=replace
    * [98-99]); Spark's decode already replaces malformed input. */
  def bytesToUtf8(c: Column): Column = decode(c, "UTF-8")

  /** Forced-string column names at table creation (reference ensure_table
    * [135-136]). */
  val forcedStringColumns: Set[String] =
    Set("value", "source_params", "child_config", "config")
}
