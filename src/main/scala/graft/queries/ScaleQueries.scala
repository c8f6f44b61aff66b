package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Skew

/** Driver-checkable scale-ops queries: the skew-mitigation operators
  * are deterministic, so they get real oracles instead of spec-only
  * coverage.
  */
object ScaleQueries extends QueryRegistry {

  /** Two-phase salted distinct count per event_type — the static
    * skew fallback for hot group keys. Salting is internal (the salt
    * column never escapes), so the result must equal the plain
    * COUNT(DISTINCT): the oracle proves the two-stage rewrite is
    * semantics-preserving; ScaleOpsSpec asserts the plan really
    * aggregates on (key, __salt) first.
    */
  val q44 = GraftQuery(
    "q44_salted_distinct_count",
    (s, d) => Skew.saltedDistinctCount(
      Tables.events(s, d), "event_type", "user_id", saltFactor = 8),
    Some("""
      SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
      FROM events
      GROUP BY event_type
    """.trim))

  def all: Seq[GraftQuery] = Seq(q44)
}
