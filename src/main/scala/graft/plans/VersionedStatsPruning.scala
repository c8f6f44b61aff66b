package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GetStructField, In, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, XxHash64}
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
  *    `literal <op> col` (op in =, <, <=, >, >=) contribute, and only
  *    in the TYPED domains `statsSuffix` records — integral longs,
  *    date epoch-days, timestamp micros, string UTF-8 prefixes
  *    (truncated maxes claim no upper bound), exact decimals, and
  *    doubles (NaN greatest, Spark's own order) — so a date-range
  *    WHERE on a date-typed column prunes without the caller
  *    pre-encoding epoch longs; stats in a different domain than the
  *    literal make no claim; strict bounds are widened to inclusive,
  *    so a kept batch may still hold no matching rows;
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

  /** Read option carrying `dir;col:min:max[;col:@<tag>:min:max...]`
    * lines — the manifest entries' stats suffixes verbatim (legacy
    * integral longs plus the round-12 typed grammar; see
    * `VersionedTable.statsSuffix`).
    */
  val StatsOption = "graft.stats"

  /** Marker option: this scan has already been pruned. */
  val PrunedOption = "graft.pruned"

  /** Encode per-dir stats for the scan's read option. */
  def encode(dirStats: Seq[(String, String)]): String =
    dirStats.map { case (dir, stats) =>
      if (stats.isEmpty) dir else s"$dir$stats"
    }.mkString("\n")

  /** One column's recorded batch envelope in its TYPED domain. Tags:
    * 'l' integral long, 'd' date epoch-days, 't' timestamp micros,
    * 's' UTF-8 string bytes, 'm' decimal, 'f' double. `hi = None`
    * means the recorded max claims no upper bound (a truncated
    * string-prefix max — `*` on disk).
    */
  private[plans] final case class Env(tag: Char, lo: Any, hi: Option[Any])

  /** Same-tag value comparison in each domain's TRUE order: longs for
    * l/d/t, unsigned-lexicographic bytes for strings (Spark's UTF8
    * binary order — the order min/max were computed under), exact
    * BigDecimal for decimals, and Double.compare for doubles (NaN
    * greatest, exactly how Spark orders and compares NaN).
    */
  private def cmp(tag: Char, a: Any, b: Any): Int = tag match {
    case 's' =>
      val x = a.asInstanceOf[Array[Byte]]; val y = b.asInstanceOf[Array[Byte]]
      var i = 0
      while (i < x.length && i < y.length) {
        val d = (x(i) & 0xff) - (y(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      x.length - y.length
    case 'm' => a.asInstanceOf[java.math.BigDecimal]
      .compareTo(b.asInstanceOf[java.math.BigDecimal])
    case 'f' => java.lang.Double.compare(
      a.asInstanceOf[Double], b.asInstanceOf[Double])
    case _ => java.lang.Long.compare(
      a.asInstanceOf[Long], b.asInstanceOf[Long])
  }

  private def hexDecode(s: String): Array[Byte] =
    s.stripPrefix("x").grouped(2)
      .map(h => Integer.parseInt(h, 16).toByte).toArray

  private def decodeVal(tag: Char, s: String): Any = tag match {
    case 's' => hexDecode(s)
    case 'm' => new java.math.BigDecimal(s)
    case 'f' => s.toDouble
    case _ => s.toLong
  }

  /** Parse one stats segment (after the leading dir field):
    * `col:lo:hi` (legacy integral) or `col:@<tag>:lo:hi`.
    */
  private def parseSeg(seg: String): Option[(String, Env)] =
    seg.split(":", -1) match {
      case Array(c, lo, hi) =>
        scala.util.Try(Env('l', lo.toLong, Some(hi.toLong)))
          .toOption.map(c -> _)
      case Array(c, t, lo, hi) if t.length == 2 && t.charAt(0) == '@' =>
        val tag = t.charAt(1)
        scala.util.Try {
          Env(tag, decodeVal(tag, lo),
            if (hi == "*") None else Some(decodeVal(tag, hi)))
        }.toOption.map(c -> _)
      case _ => None
    }

  private def decode(s: String): Seq[(String, Map[String, Env])] =
    s.split("\n").toSeq.filter(_.nonEmpty).map { line =>
      val parts = line.split(";")
      parts.head -> parts.drop(1).flatMap(parseSeg).toMap
    }

  /** A literal mapped into its stats domain: the tag its value must
    * be compared under, plus the comparable representative. Only
    * types `statsSuffix` records are claimed; anything else (binary,
    * intervals, ntz timestamps, ...) contributes no bound.
    */
  private def litTagged(l: Literal): Option[(Char, Any)] = {
    import org.apache.spark.sql.types._
    if (l.value == null) return None
    l.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        Some(('l', l.value.asInstanceOf[Number].longValue))
      case DateType => Some(('d', l.value.asInstanceOf[Int].toLong))
      case TimestampType => Some(('t', l.value.asInstanceOf[Long]))
      case StringType => Some(('s',
        l.value.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
          .getBytes))
      case _: DecimalType => Some(('m',
        l.value.asInstanceOf[org.apache.spark.sql.types.Decimal]
          .toJavaBigDecimal))
      case DoubleType => Some(('f', l.value.asInstanceOf[Double]))
      case FloatType => Some(('f', l.value.asInstanceOf[Float].toDouble))
      case _ => None
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** The dotted stats path of a column reference: a bare attribute
    * (`k`) or a GetStructField chain over one (`meta.bytes`) — the
    * SAME name `statsSuffix` records nested stats under (round 18:
    * nested statscols), physical at both ends because the rule runs
    * after NestedRenamePushdown re-bound extractions to the uncast
    * scan column. Anything else (array/map extractions, computed
    * structs) contributes no bound.
    */
  private object ColPath {
    def unapply(e: Expression): Option[String] = e match {
      // a name that itself contains the path separator would collide
      // with a genuine nested path's stats key (a top-level column
      // literally named "meta.bytes" vs the struct field meta.bytes)
      // — such columns make NO claim rather than risk testing a
      // predicate against the wrong envelope
      case a: AttributeReference if !a.name.contains(".") => Some(a.name)
      case g @ GetStructField(child, ordinal, _) =>
        child.dataType match {
          case st: org.apache.spark.sql.types.StructType
              if !st.fields(ordinal).name.contains(".") =>
            unapply(child).map(p => s"$p.${st.fields(ordinal).name}")
          case _ => None
        }
      case _ => None
    }
  }

  /** `exists(arr, x -> <cmp>(x.field, lit))` — the array-element
    * range claim (round 19): `statscols = 'arr.element.field'`
    * records the batch's envelope over ALL elements, and an exists
    * predicate requires SOME element in range — which is exactly
    * what [[envAdmits]] tests claim-by-claim (max >= lo for a lower
    * bound, min <= hi for an upper), so these claims ride the same
    * bounds map: two exists conjuncts on one field merge to
    * (max >= lo AND min <= hi), each side answerable by a DIFFERENT
    * element — never an empty-interval over-prune. One array level,
    * struct chains below it; anything else makes no claim.
    */
  private object ElemCmp {
    import org.apache.spark.sql.catalyst.expressions.{ArrayExists, LambdaFunction, NamedLambdaVariable}
    def unapply(e: Expression): Option[(String, Char, Option[Any], Option[Any])] =
      e match {
        case ae: ArrayExists => (ae.argument, ae.function) match {
          case (ColPath(arr), lf: LambdaFunction) =>
            val lv = lf.arguments.headOption.collect {
              case v: NamedLambdaVariable => v.exprId
            }
            // a GetStructField chain rooted at THE lambda variable
            object VarPath {
              def unapply(ex: Expression): Option[String] = ex match {
                case v: NamedLambdaVariable
                    if lv.contains(v.exprId) => Some("")
                case g @ GetStructField(child, ordinal, _) =>
                  child.dataType match {
                    case st: org.apache.spark.sql.types.StructType
                        if !st.fields(ordinal).name.contains(".") =>
                      unapply(child).map { p =>
                        if (p.isEmpty) st.fields(ordinal).name
                        else s"$p.${st.fields(ordinal).name}"
                      }
                    case _ => None
                  }
                case _ => None
              }
            }
            def key(f: String) = s"$arr.element.$f"
            lf.function match {
              case EqualTo(VarPath(f), l: Literal) if f.nonEmpty =>
                litTagged(l).map { case (t, v) =>
                  (key(f), t, Some(v), Some(v)) }
              case EqualTo(l: Literal, VarPath(f)) if f.nonEmpty =>
                litTagged(l).map { case (t, v) =>
                  (key(f), t, Some(v), Some(v)) }
              case GreaterThanOrEqual(VarPath(f), l: Literal) if f.nonEmpty =>
                litTagged(l).map { case (t, v) => (key(f), t, Some(v), None) }
              case GreaterThan(VarPath(f), l: Literal) if f.nonEmpty =>
                litTagged(l).map { case (t, v) => (key(f), t, Some(v), None) }
              case LessThanOrEqual(VarPath(f), l: Literal) if f.nonEmpty =>
                litTagged(l).map { case (t, v) => (key(f), t, None, Some(v)) }
              case LessThan(VarPath(f), l: Literal) if f.nonEmpty =>
                litTagged(l).map { case (t, v) => (key(f), t, None, Some(v)) }
              case GreaterThanOrEqual(l: Literal, VarPath(f)) if f.nonEmpty =>
                litTagged(l).map { case (t, v) => (key(f), t, None, Some(v)) }
              case GreaterThan(l: Literal, VarPath(f)) if f.nonEmpty =>
                litTagged(l).map { case (t, v) => (key(f), t, None, Some(v)) }
              case LessThanOrEqual(l: Literal, VarPath(f)) if f.nonEmpty =>
                litTagged(l).map { case (t, v) => (key(f), t, Some(v), None) }
              case LessThan(l: Literal, VarPath(f)) if f.nonEmpty =>
                litTagged(l).map { case (t, v) => (key(f), t, Some(v), None) }
              case _ => None
            }
          case _ => None
        }
        case _ => None
      }
  }

  /** Per-column required TYPED interval implied by the condition's
    * usable top-level conjuncts (intersection when a column appears
    * more than once). Strict comparisons widen to inclusive —
    * conservative in the keep direction. A column constrained under
    * MIXED tags (possible only through odd casts) drops all its
    * claims — keep-everything is always sound.
    */
  private[plans] def intervals(
      cond: Expression): Map[String, (Char, Option[Any], Option[Any])] = {
    val bounds: Seq[(String, Char, Option[Any], Option[Any])] =
      conjuncts(cond).filter(_.deterministic).flatMap {
        case EqualTo(ColPath(c), l: Literal) =>
          litTagged(l).map { case (t, v) => (c, t, Some(v), Some(v)) }
        case EqualTo(l: Literal, ColPath(c)) =>
          litTagged(l).map { case (t, v) => (c, t, Some(v), Some(v)) }
        case GreaterThanOrEqual(ColPath(c), l: Literal) =>
          litTagged(l).map { case (t, v) => (c, t, Some(v), None) }
        case GreaterThan(ColPath(c), l: Literal) =>
          litTagged(l).map { case (t, v) => (c, t, Some(v), None) }
        case LessThanOrEqual(ColPath(c), l: Literal) =>
          litTagged(l).map { case (t, v) => (c, t, None, Some(v)) }
        case LessThan(ColPath(c), l: Literal) =>
          litTagged(l).map { case (t, v) => (c, t, None, Some(v)) }
        // IN-list: the required interval is the values' envelope —
        // conservative (a batch covering the envelope may hold none of
        // the listed values), which is all zone maps can say
        case In(ColPath(c), vs) if vs.nonEmpty &&
            vs.forall(_.isInstanceOf[Literal]) =>
          val tagged = vs.map(v => litTagged(v.asInstanceOf[Literal]))
          if (tagged.exists(_.isEmpty)) None
          else {
            val ts = tagged.flatten
            val tags = ts.map(_._1).distinct
            if (tags.size != 1) None
            else {
              val t = tags.head
              val values = ts.map(_._2)
              Some((c, t,
                Some(values.reduce((x, y) => if (cmp(t, x, y) <= 0) x else y)),
                Some(values.reduce((x, y) => if (cmp(t, x, y) >= 0) x else y))))
            }
          }
        // mirrored literal-first forms
        case GreaterThanOrEqual(l: Literal, ColPath(c)) =>
          litTagged(l).map { case (t, v) => (c, t, None, Some(v)) }
        case GreaterThan(l: Literal, ColPath(c)) =>
          litTagged(l).map { case (t, v) => (c, t, None, Some(v)) }
        case LessThanOrEqual(l: Literal, ColPath(c)) =>
          litTagged(l).map { case (t, v) => (c, t, Some(v), None) }
        case LessThan(l: Literal, ColPath(c)) =>
          litTagged(l).map { case (t, v) => (c, t, Some(v), None) }
        // exists() over an array-element field (round 19)
        case ElemCmp(c, t, lo, hi) => Some((c, t, lo, hi))
        case _ => None
      }
    bounds.groupBy(_._1).flatMap { case (c, bs) =>
      val tags = bs.map(_._2).distinct
      if (tags.size != 1) None // mixed domains: no claim
      else {
        val t = tags.head
        val los = bs.flatMap(_._3)
        val his = bs.flatMap(_._4)
        val lo = los.reduceOption((x, y) => if (cmp(t, x, y) >= 0) x else y)
        val hi = his.reduceOption((x, y) => if (cmp(t, x, y) <= 0) x else y)
        Some(c -> (t, lo, hi))
      }
    }
  }

  /** Does a batch whose recorded envelope is `env` possibly hold a
    * row inside the required interval? No stats, a different domain
    * tag, or an unbounded side always answers yes — the superset
    * contract. A truncated string-prefix min still prunes soundly:
    * the prefix orders <= the true min, so `prefix > hi` proves
    * `min > hi`.
    */
  private def envAdmits(env: Option[Env], tag: Char,
      lo: Option[Any], hi: Option[Any]): Boolean = env match {
    case None => true
    case Some(Env(stag, _, _)) if stag != tag => true
    case Some(Env(_, smn, smx)) =>
      val upperOk = (lo, smx) match {
        case (Some(l), Some(mx)) => cmp(tag, mx, l) >= 0
        case _ => true
      }
      val lowerOk = hi match {
        case Some(h) => cmp(tag, smn, h) <= 0
        case None => true
      }
      upperOk && lowerOk
  }

  /** Literal point-set conjuncts — `col = v` and `col IN (v...)` —
    * the predicates a Bloom sidecar can answer. Columns address
    * through [[ColPath]] (round 19): a GetStructField chain probes
    * the sidecar under its dotted physical path, the same key the
    * builder records nested `bloomcols` entries under — closing the
    * stats/bloom skipping asymmetry (nested RANGE skipping shipped in
    * round 18; this is its point-lookup twin). Each conjunct is kept
    * separately: a batch survives only if EVERY point conjunct has at
    * least one admitted value. Capped at 64 values per list; larger
    * lists fall back to the interval envelope.
    */
  private def pointProbes(cond: Expression): Seq[(String, Seq[Literal])] =
    conjuncts(cond).filter(_.deterministic).flatMap {
      case EqualTo(ColPath(c), l: Literal) => Some((c, Seq(l)))
      case EqualTo(l: Literal, ColPath(c)) => Some((c, Seq(l)))
      case In(ColPath(c), vs) if vs.nonEmpty && vs.size <= 64 &&
          vs.forall(_.isInstanceOf[Literal]) =>
        Some((c, vs.map(_.asInstanceOf[Literal])))
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
      // a file root (file-level manifest) probes its PARENT dir's
      // sidecar — the sidecar is per-batch, not per-file
      val base =
        if (root.getName.endsWith(".parquet")) root.getParent else root
      val bloomDir = new Path(base, "_bloom")
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
              // a root is either the batch DIR itself or — under a
              // file-level manifest (native delta commits) — a FILE
              // inside it; both must resolve to the dir's stats
              dirStats.find { case (dir, _) =>
                rs.endsWith("/" + dir) || rs.contains("/" + dir + "/")
              } match {
                case Some((_, stats)) => req.forall { case (c, (tag, lo, hi)) =>
                  envAdmits(stats.get(c), tag, lo, hi)
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
