package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ColumnOps

/** Driver-checkable queries exercising the reference-parity scalar
  * layer (ColumnOps: SURVEY §2.2 projections + §2.3 validations) on
  * deterministic path/checksum columns synthesized from the documents
  * table. The synthesis expressions are mirrored verbatim in the
  * DuckDB oracle so both engines validate/derive the same inputs.
  */
object IngestParity extends QueryRegistry {

  /** V1 + V2 (path-structure and checksum validation, with the
    * sha256:-prefix strip + lowercase normalization).
    */
  val q13 = GraftQuery(
    "q13_validation_gates",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val dd = lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0")
      val prefix = when(col("doc_id") % 7 === 0, lit("archive/")).otherwise(lit("raw/"))
      val month = when(col("doc_id") % 13 === 0, lit("xx")).otherwise(lit("01"))
      val path = concat(prefix, col("source"), lit("/2026/"), month, lit("/"),
        dd, lit("/run"), col("doc_id").cast("string"), lit("/run.json"))
      val raw64 = concat(md5(col("text")), md5(concat(col("source"), col("text"))))
      val cased = when(col("doc_id") % 3 === 0, upper(raw64)).otherwise(raw64)
      val trunc = when(col("doc_id") % 11 === 0, substring(cased, 1, 60)).otherwise(cased)
      val checksum = when(col("doc_id") % 5 === 0, concat(lit("sha256:"), trunc)).otherwise(trunc)
      docs.select(col("doc_id"), path.as("path"), checksum.as("checksum"))
        .select(col("doc_id"),
          ColumnOps.isValidS3Path(col("path")).as("valid_path"),
          ColumnOps.normalizedChecksum(col("checksum")).as("checksum_norm"),
          ColumnOps.isValidChecksum(col("checksum")).as("valid_checksum"))
    },
    Some("""
      WITH syn AS (
        SELECT doc_id,
               (CASE WHEN doc_id % 7 = 0 THEN 'archive/' ELSE 'raw/' END) || source
                 || '/2026/' || (CASE WHEN doc_id % 13 = 0 THEN 'xx' ELSE '01' END) || '/'
                 || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                 || '/run' || CAST(doc_id AS VARCHAR) || '/run.json' AS path,
               (CASE WHEN doc_id % 5 = 0 THEN 'sha256:' ELSE '' END) ||
               (CASE WHEN doc_id % 11 = 0
                     THEN substr(CASE WHEN doc_id % 3 = 0 THEN upper(md5(text) || md5(source || text))
                                      ELSE md5(text) || md5(source || text) END, 1, 60)
                     ELSE CASE WHEN doc_id % 3 = 0 THEN upper(md5(text) || md5(source || text))
                               ELSE md5(text) || md5(source || text) END END) AS checksum
        FROM documents),
      parts AS (SELECT *, string_split(path, '/') AS p FROM syn)
      SELECT doc_id,
             (path LIKE 'raw/%' AND len(p) >= 6
              AND regexp_matches(p[3], '^[0-9]+$')
              AND regexp_matches(p[4], '^[0-9]+$')
              AND regexp_matches(p[5], '^[0-9]+$')) AS valid_path,
             lower(regexp_replace(regexp_replace(checksum, 'sha256:', '', 'g'), '^\s+|\s+$', '', 'g')) AS checksum_norm,
             regexp_matches(lower(regexp_replace(regexp_replace(checksum, 'sha256:', '', 'g'), '^\s+|\s+$', '', 'g')),
                            '^[0-9a-f]{64}$') AS valid_checksum
      FROM parts
    """.trim))

  /** P3/P4/P9/P10/P12/P13/P14 — the full file-record derivation chain
    * (build_file_record, ref lambda/agf_ingestion_lambda.py:348-417)
    * over synthesized run.json keys + manifest paths.
    */
  val q14 = GraftQuery(
    "q14_file_record_derivations",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val dd = lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0")
      val runKey = concat(lit("raw/"), col("source"), lit("/2026/01/"), dd,
        lit("/run"), col("doc_id").cast("string"), lit("/run.json"))
      val ext = when(col("doc_id") % 4 === 0, lit(".csv"))
        .when(col("doc_id") % 4 === 1, lit(".TXT"))
        .when(col("doc_id") % 4 === 2, lit(".fcs"))
        .otherwise(lit(""))
      val manifestPath = when(col("doc_id") % 9 === 0,
        concat(lit("data_"), col("doc_id").cast("string"), ext))
        .when(col("doc_id") % 9 === 1,
          concat(lit("staff_"), col("lang"), lit("/data_"), col("doc_id").cast("string"), ext))
        .otherwise(concat(lit("staff_"), col("lang"), lit("/exp"),
          (col("doc_id") % 20).cast("string"), lit("/data_"), col("doc_id").cast("string"), ext))
      val explicitStaff = when(col("doc_id") % 2 === 0, concat(lit("explicit_"), col("lang")))
        .otherwise(lit(null).cast("string"))

      val base = docs.select(col("doc_id"), runKey.as("run_key"),
        manifestPath.as("manifest_path"), explicitStaff.as("explicit_staff"))
      val runBase = expr("array_join(slice(split(run_key, '/'), 1, size(split(run_key, '/')) - 1), '/')")
      val staff = ColumnOps.staffName(col("explicit_staff"), col("manifest_path"))
      base.select(
        col("doc_id"),
        ColumnOps.instrumentId(col("run_key")).as("instrument_id"),
        ColumnOps.fileDateString(col("run_key")).as("file_date"),
        ColumnOps.runId(col("run_key")).as("run_id"),
        ColumnOps.basename(col("manifest_path")).as("file_name"),
        ColumnOps.fileExtension(col("manifest_path")).as("file_type"),
        staff.as("staff_name"),
        ColumnOps.experimentId(col("manifest_path"), staff,
          ColumnOps.runId(col("run_key"))).as("experiment_id"),
        ColumnOps.reconstructedKey(runBase, col("manifest_path")).as("s3_key"))
    },
    Some("""
      WITH syn AS (
        SELECT doc_id,
               'raw/' || source || '/2026/01/' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                 || '/run' || CAST(doc_id AS VARCHAR) || '/run.json' AS run_key,
               CASE WHEN doc_id % 9 = 0 THEN 'data_' || CAST(doc_id AS VARCHAR) ||
                         (CASE WHEN doc_id % 4 = 0 THEN '.csv' WHEN doc_id % 4 = 1 THEN '.TXT'
                               WHEN doc_id % 4 = 2 THEN '.fcs' ELSE '' END)
                    WHEN doc_id % 9 = 1 THEN 'staff_' || lang || '/data_' || CAST(doc_id AS VARCHAR) ||
                         (CASE WHEN doc_id % 4 = 0 THEN '.csv' WHEN doc_id % 4 = 1 THEN '.TXT'
                               WHEN doc_id % 4 = 2 THEN '.fcs' ELSE '' END)
                    ELSE 'staff_' || lang || '/exp' || CAST(doc_id % 20 AS VARCHAR) || '/data_' ||
                         CAST(doc_id AS VARCHAR) ||
                         (CASE WHEN doc_id % 4 = 0 THEN '.csv' WHEN doc_id % 4 = 1 THEN '.TXT'
                               WHEN doc_id % 4 = 2 THEN '.fcs' ELSE '' END)
               END AS manifest_path,
               CASE WHEN doc_id % 2 = 0 THEN 'explicit_' || lang ELSE NULL END AS explicit_staff
        FROM documents),
      der AS (
        SELECT doc_id, run_key, manifest_path,
               string_split(run_key, '/') AS rk,
               string_split(manifest_path, '/') AS mp,
               coalesce(explicit_staff, (string_split(manifest_path, '/'))[1]) AS staff_name
        FROM syn)
      SELECT doc_id,
             rk[2] AS instrument_id,
             rk[3] || '-' || rk[4] || '-' || rk[5] AS file_date,
             rk[6] AS run_id,
             mp[-1] AS file_name,
             CASE WHEN strpos(mp[-1], '.') > 0 THEN lower(split_part(mp[-1], '.', -1))
                  ELSE 'unknown' END AS file_type,
             staff_name,
             CASE WHEN len(mp) >= 2 AND mp[2] <> '' AND mp[2] <> mp[-1] THEN mp[2] || '_' || staff_name
                  ELSE 'standalone_' || staff_name || '_' || rk[6] END AS experiment_id,
             CASE WHEN len(mp) >= 2
                  THEN array_to_string(rk[1:-2], '/') || '/' || mp[1] || '/payload/' ||
                       array_to_string(mp[2:], '/')
                  ELSE array_to_string(rk[1:-2], '/') || '/' || manifest_path || '/payload/' || mp[-1]
             END AS s3_key
      FROM der
    """.trim))

  /** S3/P-json — JSON payload extraction from the event stream's
    * props column (the manifest-parse analog) + grouped rollup.
    */
  val q15 = GraftQuery(
    "q15_json_props_rollup",
    (s, d) => {
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          // floor4, not round(,4): avg of ints is a small rational that
          // can tie at the 4th decimal; floor on the identical double is
          // engine-invariant (see QualityFunctions.floor4)
          graft.functions.QualityFunctions.floor4(avg(col("k"))).as("avg_k"),
          round(sum(col("value")), 2).as("sum_value"))
    },
    // CAST(sum(int) AS BIGINT): DuckDB's integer sum is HUGEINT, which
    // the driver's pandas bridge renders as a float ("11757.0") and the
    // value hash diverges from Spark's LongType ("11757") — r1's q15/q30
    // hash-only failures were exactly this
    Some("""
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
             floor(avg(CAST(json_extract_string(props, '$.k') AS INT)) * 10000) / 10000 AS avg_k,
             round(sum(value), 2) AS sum_value
      FROM events
      GROUP BY event_type
    """.trim))

  def all: Seq[GraftQuery] = Seq(q13, q14, q15)
}
