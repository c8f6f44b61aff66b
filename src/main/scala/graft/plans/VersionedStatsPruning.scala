package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, In, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, XxHash64}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{FileStatusCache, HadoopFsRelation, InMemoryFileIndex, LogicalRelation}

/** AUTOMATIC manifest-stats data skipping for versioned-table scans —
  * the optimizer-integrated completion of `readAtPruned`, which
  * requires the CALLER to restate its predicate as explicit bounds.
  * With this rule a user writes plain declarative Spark —
  *
  *   VersionedTable.readAtAuto(spark, path, v).filter($"k" > 100)
  *
  * — and the filter itself prunes batches from the manifest's
  * KB-sized min/max stats before any parquet file (or footer) is
  * opened, the same contract Delta Lake's add-file-stats skipping and
  * Iceberg's manifest evaluator provide on top of Spark. At 100 TB
  * with date-keyed commits, the where-clause alone confines a
  * one-month query to one month's batch dirs.
  *
  * Mechanics: `readAtAuto`'s scans carry a `graft.stats` read option
  * mapping each batch dir to its manifest min/max longs. This rule
  * (injected via [[graft.expressions.GraftExtensions]], so it runs in
  * the session's normal optimizer alongside Catalyst's own
  * PushDownPredicates — which has already pushed the user's filter
  * through the merge-on-read anti-joins to sit directly on the scan)
  * matches Filter-over-scan, folds the filter's top-level conjuncts
  * into per-column required intervals, and rebuilds the scan's
  * FileIndex with only the batch dirs whose recorded ranges
  * intersect every requirement.
  *
  * Point predicates go one step further: for `col = v` / `col IN
  * (v...)` conjuncts the rule ALSO probes each surviving batch's
  * `_bloom/` sidecar (when one was written — `append(bloomCols)`),
  * read driver-side with parquet-hadoop (KB per batch, no nested
  * Spark job inside the optimizer), with hash lanes evaluated
  * through Spark's own XxHash64 expression so build and probe cannot
  * drift. That makes `WHERE k IN (3, 17)` on a hash-distributed
  * layout — where min/max envelopes are blind — open only the
  * batches that might hold those keys, with NO API beyond the
  * predicate: `lookupKeys`' pruning, optimizer-integrated.
  *
  * Strictly conservative, like all zone-map pruning:
  *  - only deterministic conjuncts of shape `col <op> literal` /
  *    `literal <op> col` (op in =, <, <=, >, >=) on integral columns
  *    contribute — matching exactly what `statsSuffix` records
  *    (long-cast min/max); strict bounds are widened to inclusive, so
  *    a kept batch may still hold no matching rows;
  *  - a batch with no recorded stats for a constrained column is
  *    never pruned (no stats = no claim — the `readAtPruned`
  *    superset contract);
  *  - the Filter always stays on top: pruning is a physical
  *    optimization, never the semantic predicate;
  *  - every batch pruned → the scan collapses to an empty
  *    LocalRelation under the same output attributes (provably no
  *    row can match).
  *
  * The rewritten scan is tagged `graft.pruned` so the fixed-point
  * optimizer batch reaches a stable plan instead of re-pruning.
  */
object VersionedStatsPruning extends Rule[LogicalPlan] {

  /** Read option carrying `dir;col:min:max[;col:min:max...]` lines. */
  val StatsOption = "graft.stats"

  /** Marker option: this scan has already been pruned. */
  val PrunedOption = "graft.pruned"

  /** Encode per-dir stats for the scan's read option. */
  def encode(dirStats: Seq[(String, String)]): String =
    dirStats.map { case (dir, stats) =>
      if (stats.isEmpty) dir else s"$dir$stats"
    }.mkString("\n")

  private def decode(s: String): Seq[(String, Map[String, (Long, Long)])] =
    s.split("\n").toSeq.filter(_.nonEmpty).map { line =>
      val parts = line.split(";")
      val stats = parts.drop(1).flatMap(_.split(":") match {
        case Array(c, lo, hi) => Some(c -> (lo.toLong, hi.toLong))
        case _ => None
      }).toMap
      parts.head -> stats
    }

  private def litLong(l: Literal): Option[Long] = l.value match {
    case v: java.lang.Long => Some(v.longValue)
    case v: java.lang.Integer => Some(v.longValue)
    case v: java.lang.Short => Some(v.longValue)
    case v: java.lang.Byte => Some(v.longValue)
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Per-column required [lo, hi] interval implied by the condition's
    * usable top-level conjuncts (intersection when a column appears
    * more than once). Strict comparisons widen to inclusive —
    * conservative in the keep direction.
    */
  private[plans] def intervals(cond: Expression): Map[String, (Long, Long)] = {
    val bounds = conjuncts(cond).filter(_.deterministic).flatMap {
      case EqualTo(a: AttributeReference, l: Literal) =>
        litLong(l).map(v => (a.name, v, v))
      case EqualTo(l: Literal, a: AttributeReference) =>
        litLong(l).map(v => (a.name, v, v))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        litLong(l).map(v => (a.name, v, Long.MaxValue))
      case GreaterThan(a: AttributeReference, l: Literal) =>
        litLong(l).map(v => (a.name, v, Long.MaxValue))
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        litLong(l).map(v => (a.name, Long.MinValue, v))
      case LessThan(a: AttributeReference, l: Literal) =>
        litLong(l).map(v => (a.name, Long.MinValue, v))
      // IN-list: the required interval is the values' envelope —
      // conservative (a batch covering the envelope may hold none of
      // the listed values), which is all zone maps can say
      case In(a: AttributeReference, vs) if vs.nonEmpty &&
          vs.forall(_.isInstanceOf[Literal]) =>
        val longs = vs.map(v => litLong(v.asInstanceOf[Literal]))
        if (longs.exists(_.isEmpty)) None
        else Some((a.name, longs.flatten.min, longs.flatten.max))
      // mirrored literal-first forms
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        litLong(l).map(v => (a.name, Long.MinValue, v))
      case GreaterThan(l: Literal, a: AttributeReference) =>
        litLong(l).map(v => (a.name, Long.MinValue, v))
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        litLong(l).map(v => (a.name, v, Long.MaxValue))
      case LessThan(l: Literal, a: AttributeReference) =>
        litLong(l).map(v => (a.name, v, Long.MaxValue))
      case _ => None
    }
    bounds.groupBy(_._1).map { case (c, bs) =>
      c -> (bs.map(_._2).max, bs.map(_._3).min)
    }
  }

  /** Literal point-set conjuncts — `col = v` and `col IN (v...)` —
    * the predicates a Bloom sidecar can answer. Each conjunct is kept
    * separately: a batch survives only if EVERY point conjunct has at
    * least one admitted value. Capped at 64 values per list; larger
    * lists fall back to the interval envelope.
    */
  private def pointProbes(cond: Expression): Seq[(String, Seq[Literal])] =
    conjuncts(cond).filter(_.deterministic).flatMap {
      case EqualTo(a: AttributeReference, l: Literal) => Some((a.name, Seq(l)))
      case EqualTo(l: Literal, a: AttributeReference) => Some((a.name, Seq(l)))
      case In(a: AttributeReference, vs) if vs.nonEmpty && vs.size <= 64 &&
          vs.forall(_.isInstanceOf[Literal]) =>
        Some((a.name, vs.map(_.asInstanceOf[Literal])))
      case _ => None
    }

  /** Driver-side Bloom sidecar probe of one batch dir: true when the
    * batch MIGHT satisfy every point conjunct. No sidecar (or no
    * rows for a probed column, or any read failure) = no claim =
    * keep — pruning stays strictly conservative. Reads the KB-sized
    * `_bloom/` parquet with parquet-hadoop directly (no nested Spark
    * job inside the optimizer); hash lanes are evaluated through
    * Spark's own XxHash64 expression, so build and probe cannot
    * drift.
    */
  private def bloomAdmits(root: Path,
      conf: org.apache.hadoop.conf.Configuration,
      probes: Seq[(String, Seq[Literal])]): Boolean =
    try {
      val bloomDir = new Path(root, "_bloom")
      val f = bloomDir.getFileSystem(conf)
      if (!f.exists(bloomDir)) return true
      val bitsByCol = scala.collection.mutable.Map
        .empty[String, (Long, scala.collection.mutable.Set[Long])]
      f.listStatus(bloomDir).map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).foreach { part =>
          val reader = org.apache.parquet.hadoop.ParquetReader
            .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
              part)
            .withConf(conf).build()
          try {
            var g = reader.read()
            while (g != null) {
              val c = g.getString("col", 0)
              val entry = bitsByCol.getOrElseUpdate(c,
                (g.getLong("bits", 0), scala.collection.mutable.Set.empty[Long]))
              entry._2 += g.getLong("bit", 0)
              g = reader.read()
            }
          } finally reader.close()
        }
      probes.forall { case (c, lits) =>
        bitsByCol.get(c) match {
          case None => true // sidecar makes no claim for this column
          case Some((bits, set)) => lits.exists { l =>
            def lane(i: Int): Long = {
              val h = XxHash64(Seq(l, Literal(i)), 42L)
                .eval(null).asInstanceOf[Long]
              ((h % bits) + bits) % bits
            }
            set.contains(lane(1)) && set.contains(lane(2))
          }
        }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        logWarning(s"bloom probe of $root failed; keeping the batch", e)
        true
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, lr: LogicalRelation) =>
      lr.relation match {
        case fs: HadoopFsRelation
            if fs.options.contains(StatsOption) &&
              !fs.options.contains(PrunedOption) =>
          val req = intervals(cond)
          val probes = pointProbes(cond)
          if (req.isEmpty && probes.isEmpty) f
          else {
            val dirStats = decode(fs.options(StatsOption))
            val roots = fs.location.rootPaths
            val statsKept = roots.filter { r =>
              val rs = r.toString
              dirStats.find { case (dir, _) => rs.endsWith("/" + dir) } match {
                case Some((_, stats)) => req.forall { case (c, (lo, hi)) =>
                  stats.get(c).forall { case (mn, mx) => mx >= lo && mn <= hi }
                }
                case None => true // dir not in the map: no claim, keep
              }
            }
            val kept =
              if (probes.isEmpty) statsKept
              else {
                val conf = fs.sparkSession.sessionState.newHadoopConf()
                statsKept.filter(r => bloomAdmits(r, conf, probes))
              }
            if (kept.size == roots.size) {
              if (probes.isEmpty) f // pure interval math: free to re-run
              else {
                // probe did IO and pruned nothing: tag the scan (same
                // FileIndex) so the fixed-point batch doesn't re-probe
                val opts = fs.options + (PrunedOption -> "true")
                val rel = fs.copy(options = opts)(fs.sparkSession)
                f.copy(child = lr.copy(relation = rel))
              }
            }
            else if (kept.isEmpty) f.copy(child = LocalRelation(lr.output))
            else {
              val opts = fs.options + (PrunedOption -> "true")
              val idx = new InMemoryFileIndex(fs.sparkSession, kept, opts,
                Some(fs.dataSchema), FileStatusCache.getOrCreate(fs.sparkSession))
              val rel = fs.copy(location = idx, options = opts)(fs.sparkSession)
              f.copy(child = lr.copy(relation = rel))
            }
          }
        case _ => f
      }
  }
}
