package graft.catalog

import java.util.Locale

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** One persisted table-metadata state. Metadata is VERSIONED
  * (`_table.meta` = generation 0 from CREATE TABLE, `_meta.<N>` from
  * the Nth ALTER): every ALTER commits a WHOLE new generation via
  * exclusive create — compare-and-swap, so two concurrent ALTERs
  * cannot silently lose one side's change (whole-file last-writer-
  * wins was the round-14 ADVICE hazard; now the loser fails loudly).
  * Old generations are retained: they are the SCHEMA EPOCHS that make
  * `VERSION AS OF` time travel name-correct across RENAME/DROP COLUMN
  * (`since` = the first DATA version the generation's schema applies
  * to), and they are KB-sized like the manifests they sit next to.
  */
case class MetaState(gen: Long, schema: StructType,
    props: Map[String, String], since: Long, dropped: Seq[String])

/** Path-keyed metadata I/O — shared by the catalog (identifier →
  * path) and by path-level machinery that must honor a catalog
  * table's declarations when writing into its directory (key
  * null-checks, maintenance column translation).
  */
private[graft] object GraftTableMeta {

  private val MetaFile = "_table.meta"
  private val MetaRe = "_meta\\.(\\d+)".r

  private def fs(path: String): FileSystem =
    new Path(path).getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)

  def metaGens(path: String): Seq[Long] = {
    val f = fs(path)
    val dir = new Path(path)
    if (!f.exists(dir)) return Seq.empty
    f.listStatus(dir).map(_.getPath.getName).collect {
      case MetaFile => 0L
      case MetaRe(n) => n.toLong
    }.toSeq.sorted
  }

  private def metaPath(path: String, gen: Long): Path =
    new Path(path, if (gen == 0L) MetaFile else s"_meta.$gen")

  private def parseSchema(s: String): StructType =
    if (s.trim.startsWith("{"))
      org.apache.spark.sql.types.DataType.fromJson(s).asInstanceOf[StructType]
    else StructType.fromDDL(s)

  def readGen(path: String, gen: Long): MetaState = {
    val props = new java.util.Properties()
    val in = fs(path).open(metaPath(path, gen))
    try props.load(new java.io.InputStreamReader(in, "UTF-8"))
    finally in.close()
    val schema = Option(props.getProperty("__schema"))
      .map(parseSchema).getOrElse(new StructType())
    val since = Option(props.getProperty("__since")).map(_.toLong)
      .getOrElse(0L)
    val dropped = Option(props.getProperty("__dropped")).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val others = props.stringPropertyNames().asScala
      .filterNot(k => k == "__schema" || k == "__since" || k == "__dropped")
      .map(k => k -> props.getProperty(k)).toMap
    MetaState(gen, schema, others, since, dropped)
  }

  /** The CURRENT metadata: the highest generation; None for a
    * path-built table that never saw DDL.
    */
  def readLatest(path: String): Option[MetaState] =
    metaGens(path).lastOption.map(readGen(path, _))

  /** The schema EPOCH governing a read pinned at data `version`: the
    * newest generation whose `since` is at or before it — so
    * `VERSION AS OF` a pre-rename version reads under the old names
    * (the Delta column-mapping time-travel contract). Falls back to
    * the earliest generation for versions older than every epoch.
    */
  def metaForVersion(path: String, version: Long): Option[MetaState] = {
    val gens = metaGens(path)
    if (gens.isEmpty) return None
    val states = gens.map(readGen(path, _))
    states.reverse.find(_.since <= version).orElse(states.headOption)
  }

  /** Write metadata generation `state.gen` via EXCLUSIVE create — the
    * CAS point: a concurrent ALTER that already published this
    * generation makes the create fail
    * (`FileAlreadyExistsException`), and the caller refuses loudly
    * instead of silently dropping the other side's change.
    */
  def writeGen(path: String, state: MetaState): Unit = {
    val f = fs(path)
    f.mkdirs(new Path(path))
    val props = new java.util.Properties()
    // JSON carries per-field metadata (the physical-name mapping) —
    // checked at EVERY nesting level: a nested-only mapping's
    // metadata lives inside the struct type, and DDL serialization
    // would silently strip it (round-17 bug: the first nested RENAME
    // lost its physical pin here). Plain schemas keep the
    // human-readable DDL form.
    def anyMeta(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt match {
        case st: StructType =>
          st.exists(f => f.metadata != Metadata.empty || anyMeta(f.dataType))
        case at: org.apache.spark.sql.types.ArrayType =>
          anyMeta(at.elementType)
        case mt: org.apache.spark.sql.types.MapType =>
          anyMeta(mt.keyType) || anyMeta(mt.valueType)
        case _ => false
      }
    val schemaStr =
      if (state.schema.exists(f =>
        f.metadata != Metadata.empty || anyMeta(f.dataType)))
        state.schema.json
      else state.schema.toDDL
    props.setProperty("__schema", schemaStr)
    props.setProperty("__since", state.since.toString)
    if (state.dropped.nonEmpty)
      props.setProperty("__dropped", state.dropped.mkString(","))
    state.props.foreach { case (k, v) => props.setProperty(k, v) }
    val out = f.create(metaPath(path, state.gen), false)
    try props.store(new java.io.OutputStreamWriter(out, "UTF-8"),
      "graft table")
    finally out.close()
  }
}

/** COLUMN MAPPING — logical names over stable PHYSICAL parquet names
  * (the Delta column-mapping shape, carried as per-field metadata in
  * the table metadata): RENAME COLUMN keeps the physical name and
  * changes only the logical one; DROP COLUMN removes the field and
  * records its physical name as retired — both METADATA-ONLY, zero
  * data rewritten. A column ADDED after a drop/rename of the same
  * name gets a FRESH physical name, so stale parquet values can never
  * resurface under a reused logical name.
  */
object ColumnMapping {

  val PhysicalKey = "graft.physical"

  def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysicalKey)) f.metadata.getString(PhysicalKey)
    else f.name

  def withPhysical(f: StructField, phys: String): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putString(PhysicalKey, phys).build())

  /** Whether any field's physical name differs from its logical one —
    * at the TOP level or on any NESTED struct field (round 17: the
    * mapping extends to nested paths, so RENAME/DROP of a struct
    * field is metadata-only too).
    */
  def isActive(schema: StructType): Boolean =
    schema.exists(f => physicalName(f) != f.name || nestedActive(f.dataType))

  /** Whether `dt` carries a nested field whose physical name differs
    * from its logical one (recursing through structs, arrays, maps).
    */
  private[graft] def nestedActive(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case st: StructType =>
        st.exists(f => physicalName(f) != f.name || nestedActive(f.dataType))
      case at: org.apache.spark.sql.types.ArrayType =>
        nestedActive(at.elementType)
      case mt: org.apache.spark.sql.types.MapType =>
        nestedActive(mt.keyType) || nestedActive(mt.valueType)
      case _ => false
    }

  /** `dt` with every nested struct field renamed to its PHYSICAL
    * name, metadata stripped (the storage type).
    */
  private[graft] def physicalType(
      dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType =
    dt match {
      case st: StructType => StructType(st.map(f => StructField(
        physicalName(f), physicalType(f.dataType), f.nullable,
        Metadata.empty)))
      case at: org.apache.spark.sql.types.ArrayType =>
        at.copy(elementType = physicalType(at.elementType))
      case mt: org.apache.spark.sql.types.MapType =>
        mt.copy(keyType = physicalType(mt.keyType),
          valueType = physicalType(mt.valueType))
      case other => other
    }

  /** `dt` with LOGICAL names everywhere and mapping metadata stripped
    * — the cast target that renames a physical-named struct back to
    * its logical presentation (struct casts bind by POSITION, and
    * rename/drop never reorders, so the positional cast is exact).
    */
  private[graft] def logicalType(
      dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType =
    dt match {
      case st: StructType => StructType(st.map(f => StructField(
        f.name, logicalType(f.dataType), f.nullable, Metadata.empty)))
      case at: org.apache.spark.sql.types.ArrayType =>
        at.copy(elementType = logicalType(at.elementType))
      case mt: org.apache.spark.sql.types.MapType =>
        mt.copy(keyType = logicalType(mt.keyType),
          valueType = logicalType(mt.valueType))
      case other => other
    }

  /** The schema as stored on disk: physical names AT EVERY LEVEL,
    * metadata stripped, top-level columns nullable (parquet storage
    * makes no non-null claims).
    */
  def physicalSchema(schema: StructType): StructType =
    StructType(schema.map(f => StructField(physicalName(f),
      physicalType(f.dataType), nullable = true,
      metadata = Metadata.empty)))

  /** Rename a write-side schema's fields to their physical names
    * (positions unchanged — InternalRow data is positional). Recurses
    * into nested structs: the analyzer conformed the write to the
    * table's logical shape, so nested fields match the table's by
    * name and keep its order.
    */
  def toPhysical(write: StructType, table: StructType): StructType = {
    def one(wdt: org.apache.spark.sql.types.DataType,
        tdt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType =
      (wdt, tdt) match {
        case (ws: StructType, ts: StructType) =>
          val byLc = ts.map(f =>
            f.name.toLowerCase(Locale.ROOT) -> f).toMap
          StructType(ws.map { f =>
            byLc.get(f.name.toLowerCase(Locale.ROOT)) match {
              case Some(tf) => StructField(physicalName(tf),
                one(f.dataType, tf.dataType), f.nullable, Metadata.empty)
              case None => f.copy(metadata = Metadata.empty)
            }
          })
        case (wa: org.apache.spark.sql.types.ArrayType,
            ta: org.apache.spark.sql.types.ArrayType) =>
          wa.copy(elementType = one(wa.elementType, ta.elementType))
        case (wm: org.apache.spark.sql.types.MapType,
            tm: org.apache.spark.sql.types.MapType) =>
          wm.copy(keyType = one(wm.keyType, tm.keyType),
            valueType = one(wm.valueType, tm.valueType))
        case _ => wdt
      }
    val byLc = table.map(f => f.name.toLowerCase(Locale.ROOT) -> f).toMap
    StructType(write.map { f =>
      byLc.get(f.name.toLowerCase(Locale.ROOT)) match {
        case Some(tf) => StructField(physicalName(tf),
          one(f.dataType, tf.dataType), f.nullable, Metadata.empty)
        case None => f.copy(metadata = Metadata.empty)
      }
    })
  }

  /** Translate a logical column-name list (statscols/bloomcols,
    * ZORDER BY lists) to physical names; unknown names pass through
    * untouched.
    */
  def colsToPhysical(cols: Seq[String], table: StructType): Seq[String] = {
    val phys = table.map(f =>
      f.name.toLowerCase(Locale.ROOT) -> physicalName(f)).toMap
    // a DOTTED spec names a nested struct field (round 18 — nested
    // statscols): every segment translates through its level's
    // mapping. When the path walk FAILS to resolve, fall back to a
    // literal top-level column of that exact (dotted) name before
    // passing through untouched — so a renamed column whose name
    // happens to contain a dot still translates. Paths resolvable
    // neither way pass through untouched (the no-claim contract —
    // stats under an unknown name never prune).
    def dotted(c: String): Option[String] = {
      val parts = c.split("\\.").toSeq
      def go(st: StructType, ps: Seq[String],
          acc: Seq[String]): Option[String] =
        st.find(_.name.equalsIgnoreCase(ps.head)) match {
          case None => None
          case Some(f) =>
            val acc2 = acc :+ physicalName(f)
            if (ps.length == 1) Some(acc2.mkString("."))
            else f.dataType match {
              case inner: StructType => go(inner, ps.tail, acc2)
              // the "element" segment is STRUCTURAL (round 19 —
              // array-element statscols): it passes through verbatim
              // and the walk continues in the element struct
              case at: org.apache.spark.sql.types.ArrayType
                  if ps(1).equalsIgnoreCase("element") &&
                    at.elementType.isInstanceOf[StructType] =>
                if (ps.length == 2) None // bare element: not a field
                else go(at.elementType.asInstanceOf[StructType],
                  ps.drop(2), acc2 :+ "element")
              case _ => None
            }
        }
      go(table, parts, Seq.empty)
    }
    def one(c: String) =
      if (c.contains("."))
        dotted(c).getOrElse(phys.getOrElse(c.toLowerCase(Locale.ROOT), c))
      else phys.getOrElse(c.toLowerCase(Locale.ROOT), c)
    // a composite Bloom spec (`a+b`) translates per component —
    // TRIMMED, matching writeBloomSidecar's canonicalization: an
    // untrimmed 'a + b' would fail per-component translation (keys
    // carry spaces) and the sidecar lane would silently degrade to
    // the first-component superset
    cols.map(c =>
      if (c.contains("+")) c.split("\\+").map(_.trim).map(one).mkString("+")
      else one(c))
  }

  /** Path-level translation for tooling that holds only the table
    * directory (OPTIMIZE ZORDER over a catalog name): logical →
    * physical under the path's CURRENT metadata; identity when the
    * path carries no metadata or no mapping.
    */
  def colsToPhysicalAt(path: String, cols: Seq[String]): Seq[String] =
    GraftTableMeta.readLatest(path) match {
      case Some(m) if isActive(m.schema) => colsToPhysical(cols, m.schema)
      case _ => cols
    }

  /** Whether `m` changes what a physical-named frame should present:
    * an active mapping (some logical name differs from its physical
    * one) or retired physical columns a DROP left behind in footers.
    */
  def needsLogicalView(m: MetaState): Boolean =
    isActive(m.schema) || m.dropped.nonEmpty

  /** Alias a PHYSICAL-named frame to `m`'s LOGICAL view: retired
    * (dropped) physical columns are projected away — their stale
    * parquet values must never leak to a reader — mapped physical
    * names alias to their logical names (bare aliases, so filters
    * composed on top still reach PushedFilters), and passenger
    * columns (`_change_type`) ride through untouched. NESTED mapping
    * (round 17): a column whose struct type renames or retires inner
    * fields gets `dropFields` for the retired physical paths (a
    * no-op when the scanned files already lack them) followed by one
    * positional CAST to the logical struct type — metadata-only on
    * disk, one codegen'd projection at read. Identity when the state
    * carries no mapping and no drops.
    */
  def toLogical(df: org.apache.spark.sql.DataFrame,
      m: MetaState): org.apache.spark.sql.DataFrame =
    if (!needsLogicalView(m)) df
    else {
      val lc = (s: String) => s.toLowerCase(Locale.ROOT)
      val fieldOf = m.schema.map(f => lc(physicalName(f)) -> f).toMap
      // top-level drops have no '.'; nested drops are physical PATHS
      // ("<top-phys>.<inner-phys>[...]")
      val (nestedDropped, topDropped) = m.dropped.partition(_.contains("."))
      val droppedLc = topDropped.map(lc).toSet
      val nestedDropsUnder: Map[String, Seq[String]] = nestedDropped
        .groupBy(p => lc(p.split("\\.").head))
        .map { case (top, paths) =>
          top -> paths.map(_.split("\\.", 2)(1)) }
      val scannedType = df.schema.map(f => lc(f.name) -> f.dataType).toMap
      val cols = df.columns.toSeq.flatMap { c =>
        if (droppedLc(lc(c))) None
        else fieldOf.get(lc(c)) match {
          case Some(f) =>
            var e = org.apache.spark.sql.functions.col(c)
            val drops = nestedDropsUnder.getOrElse(lc(c), Seq.empty)
            drops.foreach { inner =>
              e = dropPath(e, scannedType(lc(c)), inner.split("\\.").toSeq)
            }
            if (physicalType(f.dataType) != logicalType(f.dataType)) {
              // the scanned type AFTER retiring dropped inner fields;
              // when it matches the declared physical shape the
              // rename is ONE positional cast (the codegen'd fast
              // path every explicit-schema scan takes). A scan that
              // presents FEWER inner fields — a path read without
              // explicit schema over batches predating a nested ADD
              // — rebuilds the struct null-guarded by PHYSICAL name
              // instead: the positional cast would mis-bind or fail.
              val afterDrops = stripPaths(scannedType(lc(c)),
                drops.map(_.split("\\.").toSeq))
              if (allNullable(afterDrops) ==
                allNullable(physicalType(f.dataType)))
                e = e.cast(logicalType(f.dataType))
              else
                e = rebuildLogical(e, afterDrops, f.dataType)
            }
            Some(e.as(f.name))
          case None => Some(org.apache.spark.sql.functions.col(c))
        }
      }
      df.select(cols: _*)
    }

  /** `dt` with every nullability flag set (shape comparison must not
    * hinge on parquet-vs-declaration nullability cosmetics — the
    * positional cast never consulted them either).
    */
  private def allNullable(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType =
    dt match {
      case st: StructType => StructType(st.map(f => StructField(f.name,
        allNullable(f.dataType), nullable = true, Metadata.empty)))
      case at: org.apache.spark.sql.types.ArrayType =>
        org.apache.spark.sql.types.ArrayType(allNullable(at.elementType),
          containsNull = true)
      case mt: org.apache.spark.sql.types.MapType =>
        org.apache.spark.sql.types.MapType(allNullable(mt.keyType),
          allNullable(mt.valueType), valueContainsNull = true)
      case other => other
    }

  /** `dt` minus the dotted physical paths (mirrors what `dropFields`
    * did to the value) — so the scanned shape compares against the
    * declared physical shape on equal terms.
    */
  /** Remove the field addressed by PHYSICAL `segs` from value `e` of
    * scanned type `dt`. The "element" segment steps through an array
    * into its element struct via `transform` (round 19 — nested DDL
    * through array elements); struct-only remainders collapse to one
    * `dropFields` call (it takes dotted struct paths natively). NULL
    * parents stay NULL (`dropFields`/`transform` are null-preserving).
    */
  private def dropPath(e: org.apache.spark.sql.Column,
      dt: org.apache.spark.sql.types.DataType,
      segs: Seq[String]): org.apache.spark.sql.Column = {
    val elemAt = segs.indexWhere(_.equalsIgnoreCase("element"))
    dt match {
      case _ if elemAt < 0 => e.dropFields(segs.mkString("."))
      case st: StructType =>
        // descend struct levels up to the array field, then recurse
        val head = segs.head
        val f = st.find(_.name.equalsIgnoreCase(head))
        f match {
          case Some(sf) => e.withField(head,
            dropPath(e.getField(head), sf.dataType, segs.tail))
          case None => e // field absent from this scan: nothing to drop
        }
      case at: org.apache.spark.sql.types.ArrayType
          if segs.head.equalsIgnoreCase("element") =>
        org.apache.spark.sql.functions.transform(e,
          x => dropPath(x, at.elementType, segs.tail))
      case _ => e // shape mismatch: make no change rather than fail the read
    }
  }

  private def stripPaths(dt: org.apache.spark.sql.types.DataType,
      paths: Seq[Seq[String]]): org.apache.spark.sql.types.DataType =
    dt match {
      case st: StructType if paths.nonEmpty =>
        val lc = (s: String) => s.toLowerCase(Locale.ROOT)
        val gone = paths.filter(_.length == 1).map(p => lc(p.head)).toSet
        StructType(st.fields.toSeq
          .filterNot(f => gone(lc(f.name)))
          .map { f =>
            val deeper = paths.filter(p =>
              p.length > 1 && lc(p.head) == lc(f.name)).map(_.tail)
            f.copy(dataType = stripPaths(f.dataType, deeper))
          })
      case at: org.apache.spark.sql.types.ArrayType
          if paths.exists(_.headOption.exists(_.equalsIgnoreCase("element"))) =>
        at.copy(elementType = stripPaths(at.elementType,
          paths.filter(_.headOption.exists(_.equalsIgnoreCase("element")))
            .map(_.tail)))
      case other => other
    }

  /** Present a PHYSICAL-named struct value under its declared LOGICAL
    * type when the scanned shape is narrower than declared (batches
    * predating a nested ADD, read without an explicit schema):
    * declared inner fields present in the scan extract by physical
    * name (recursing), absent ones NULL-fill — wrapped null-guarded,
    * so a NULL parent struct stays NULL instead of becoming a struct
    * of NULLs.
    */
  private def rebuildLogical(e: org.apache.spark.sql.Column,
      scanned: org.apache.spark.sql.types.DataType,
      declared: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, struct, when}
    (scanned, declared) match {
      case (sc: StructType, de: StructType) =>
        val lcOf = (s: String) => s.toLowerCase(Locale.ROOT)
        val scByLc = sc.map(f => lcOf(f.name) -> f).toMap
        val inner = de.map { f =>
          scByLc.get(lcOf(physicalName(f))) match {
            case Some(sf) =>
              rebuildLogical(e.getField(sf.name), sf.dataType, f.dataType)
                .as(f.name)
            case None =>
              lit(null).cast(logicalType(f.dataType)).as(f.name)
          }
        }
        when(e.isNotNull, struct(inner: _*))
          .otherwise(lit(null).cast(logicalType(de)))
      case (sc: org.apache.spark.sql.types.ArrayType,
          de: org.apache.spark.sql.types.ArrayType) =>
        // array elements rebuild per element (round 19 — nested DDL
        // through array elements); transform preserves NULL arrays
        org.apache.spark.sql.functions.transform(e,
          x => rebuildLogical(x, sc.elementType, de.elementType))
      case _ =>
        if (scanned == logicalType(declared)) e
        else e.cast(logicalType(declared))
    }
  }

  /** The protocol feature set `m` requires of a reader (empty when
    * no gated feature is active): `column-mapping` whenever the
    * logical view differs from storage, plus `column-mapping-nested`
    * when the mapping extends into struct fields — a flat-mapping
    * reader would silently mis-present nested renames/drops, so the
    * nested form is gated by its OWN feature name.
    */
  def protocolFeatures(m: MetaState): Seq[String] =
    if (!needsLogicalView(m)) Seq.empty
    else if (m.schema.exists(f => nestedActive(f.dataType)) ||
      m.dropped.exists(_.contains(".")))
      Seq("column-mapping", "column-mapping-nested")
    else Seq("column-mapping")

  /** [[toLogical]] under the schema EPOCH governing data `version` at
    * `path` (see [[GraftTableMeta.metaForVersion]]) — what makes a
    * PATH-level `readAt` of a renamed/dropped table speak the same
    * names the catalog's `VERSION AS OF` does. Identity when the path
    * carries no metadata or the epoch needs no view.
    */
  def toLogicalAt(df: org.apache.spark.sql.DataFrame, path: String,
      version: Long): org.apache.spark.sql.DataFrame =
    GraftTableMeta.metaForVersion(path, version) match {
      case Some(m) => toLogical(df, m)
      case None => df
    }

  /** Logical → physical column-name translation under the epoch
    * governing `version` (identity without metadata/mapping) — for
    * path-level entry points taking column arguments (`readAtPruned`'s
    * prune column, `lookupKeys`' key column).
    */
  def colsToPhysicalAtVersion(path: String, version: Long,
      cols: Seq[String]): Seq[String] =
    GraftTableMeta.metaForVersion(path, version) match {
      case Some(m) if isActive(m.schema) => colsToPhysical(cols, m.schema)
      case _ => cols
    }
}
