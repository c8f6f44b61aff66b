package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar expression layer: every projection / validation the
  * reference hand-codes in Python (SURVEY.md §2.2 / §2.3), expressed
  * as built-in, codegen-friendly column expressions — zero UDFs, so
  * the whole layer stays inside whole-stage codegen at 100 TB.
  *
  * Reference citations are into /root/reference (SynBioExplorer/
  * agf-data-ingestion), file lambda/agf_ingestion_lambda.py unless
  * noted.
  */
object ColumnOps {

  // ---------------------------------------------------------------
  // Path handling (P2, P3, P4, V1) — key contract
  // raw/{instrument}/{YYYY}/{MM}/{DD}/{run_id}/... (ref :71-93,183-191)
  // ---------------------------------------------------------------

  /** P2 — URL-decode of the S3 key (ref :144, unquote_plus). Spark's
    * url_decode matches unquote_plus including '+' -> space.
    */
  def urlDecoded(key: Column): Column = url_decode(key)

  /** Path segments, 1-based access via element_at. */
  def pathSegments(key: Column): Column = split(key, "/")

  /** V1 — path-structure validation (ref :71-93): starts with raw/,
    * >= 6 segments, segments 3..5 (1-based; year/month/day) all digits.
    */
  def isValidS3Path(key: Column): Column = {
    val parts = pathSegments(key)
    key.startsWith("raw/") &&
      size(parts) >= 6 &&
      element_at(parts, 3).rlike("^[0-9]+$") &&
      element_at(parts, 4).rlike("^[0-9]+$") &&
      element_at(parts, 5).rlike("^[0-9]+$")
  }

  /** P3 — path-derived fields (ref :187-191). */
  def instrumentId(key: Column): Column = element_at(pathSegments(key), 2)
  def runId(key: Column): Column = element_at(pathSegments(key), 6)

  /** P4 — "YYYY-MM-DD" date string from path segments (ref :216). */
  def fileDateString(key: Column): Column = {
    val p = pathSegments(key)
    concat_ws("-", element_at(p, 3), element_at(p, 4), element_at(p, 5))
  }

  // ---------------------------------------------------------------
  // Checksums (V2, ref :32-34, :96-112)
  // ---------------------------------------------------------------

  /** V2 — remove sha256: prefix occurrences, strip surrounding
    * whitespace, lowercase — replace-then-strip exactly like the
    * reference's validate_checksum (replace removes ALL occurrences,
    * not only a leading prefix; ref :96-112).
    */
  def normalizedChecksum(c: Column): Column =
    lower(regexp_replace(regexp_replace(c, "sha256:", ""), "^\\s+|\\s+$", ""))

  /** V2 — normalized checksum must be exactly 64 hex chars. */
  def isValidChecksum(c: Column): Column =
    normalizedChecksum(c).rlike("^[0-9a-f]{64}$")

  // ---------------------------------------------------------------
  // Timestamps (P1, P7, P8 — ref :42-68, :215+, :223)
  // ---------------------------------------------------------------

  /** P1 lenient — ISO-8601 (Z ok) -> epoch seconds; unparseable or
    * empty falls back to now() with the strict/lenient split handled
    * by routing on isParseableTimestamp (ref :55-68).
    */
  def lenientEpoch(c: Column): Column =
    coalesce(
      unix_timestamp(try_to_timestamp(regexp_replace(c, "Z$", "+00:00"))),
      unix_timestamp(current_timestamp()))

  /** P1 strict — the validation predicate that routes to quarantine
    * when STRICT_TIMESTAMP_PARSING is on (ref :30,55-57).
    */
  def isParseableTimestamp(c: Column): Column =
    try_to_timestamp(regexp_replace(c, "Z$", "+00:00")).isNotNull

  /** P7 — epoch truncation (Decimal(str(int(ts))), ref :215 etc.). */
  def epochSeconds(ts: Column): Column = ts.cast("long")

  /** P8 — ingest-time audit column (ref :223,411,449). */
  def ingestEpoch(): Column = unix_timestamp(current_timestamp())

  // ---------------------------------------------------------------
  // File-record derivations (P9-P14, ref :348-454)
  // ---------------------------------------------------------------

  /** P13 — basename = last path segment (ref :399). */
  def basename(path: Column): Column = substring_index(path, "/", -1)

  /** P12 — lowercased extension of the basename, else 'unknown'
    * (ref :399-400, :437-438).
    */
  def fileExtension(path: Column): Column = {
    val base = basename(path)
    when(base.contains("."), lower(substring_index(base, ".", -1)))
      .otherwise(lit("unknown"))
  }

  /** P14 — staff-name fallback: explicit staff_name, else the first
    * path segment (ref :364 — the 'unknown' default is unreachable
    * since split always yields >= 1 segment, matched here).
    */
  def staffName(explicitStaff: Column, manifestPath: Column): Column =
    coalesce(explicitStaff, element_at(pathSegments(manifestPath), 1))

  /** P9 — experiment-id derivation (ref :359-377): the *second*
    * segment of the manifest path is the experiment folder; it counts
    * only when it is not the final (filename) segment. Folder present
    * -> "{folder}_{staff}"; else "standalone_{staff}_{run_id}".
    */
  def experimentId(manifestPath: Column, staff: Column, runId: Column): Column = {
    val parts = pathSegments(manifestPath)
    // try_element_at: ANSI element_at throws on out-of-bounds even
    // behind a short-circuit guard once the optimizer reorders it
    val folder = try_element_at(parts, lit(2))
    // empty folder segment (double slash) is falsy in the reference's
    // `if experiment_folder and ...` -> standalone (ref :366-377)
    when(size(parts) >= 2 && folder =!= lit("") && folder =!= element_at(parts, -1),
      concat_ws("_", folder, staff))
      .otherwise(concat(lit("standalone_"), staff, lit("_"), runId))
  }

  /** P10 — S3-key reconstruction (ref :379-393): the sync client
    * inserts "payload/" after the staff segment, so manifest path
    * staff/rest... maps to {runBase}/staff/payload/rest... A
    * single-segment path "f" maps to {runBase}/f/payload/f — quirky,
    * but exactly what the reference computes (ref :389-391).
    */
  def reconstructedKey(runBase: Column, manifestPath: Column): Column = {
    val parts = pathSegments(manifestPath)
    val rest = array_join(slice(parts, lit(2), size(parts) - 1), "/")
    when(size(parts) >= 2,
      concat_ws("/", runBase, element_at(parts, 1), lit("payload"), rest))
      .otherwise(concat_ws("/", runBase, manifestPath, lit("payload"),
        element_at(parts, -1)))
  }

  /** P11 — experiment file key: dirname of the experiment.json key +
    * relative path (ref :429-431).
    */
  def experimentFileKey(expJsonKey: Column, relativePath: Column): Column =
    concat_ws("/", regexp_extract(expJsonKey, "^(.*)/[^/]+$", 1), relativePath)

  /** P5 — manifest-sum fallback for total bytes (ref :205-207):
    * provided total, else sum of manifest entry sizes via higher-order
    * aggregate (no explode, no shuffle).
    */
  def totalBytes(provided: Column, manifest: Column): Column =
    coalesce(provided,
      aggregate(coalesce(manifest, array()), lit(0L),
        (acc, f) => acc + coalesce(f.getField("size"), lit(0L))))

  /** P6 — map-keys extraction (ref :219). */
  def staffNames(filesByStaff: Column): Column = map_keys(filesByStaff)
}
