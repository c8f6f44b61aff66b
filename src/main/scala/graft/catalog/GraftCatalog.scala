package graft.catalog

import java.util.Locale

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsOverwrite, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.sources.{AlwaysTrue, Filter, InsertableRelation}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.VersionedTable

/** The versioned table as a FIRST-CLASS CATALOG — names instead of
  * paths, the piece that makes the engine consumable by SQL-only
  * (JDBC/thrift) users with zero graft imports and zero
  * `GraftSql.register` calls:
  *
  *   spark.sql.catalog.graft      = graft.catalog.GraftCatalog
  *   spark.sql.catalog.graft.root = /warehouse/graft
  *
  *   CREATE TABLE graft.t (k BIGINT, v STRING) TBLPROPERTIES('key'='k')
  *   INSERT INTO graft.t SELECT ...        -- Spark-native resolution
  *   SELECT * FROM graft.t VERSION AS OF 3 -- catalog time travel
  *   CREATE TABLE graft.t2 AS SELECT ...   -- CTAS / saveAsTable
  *   MERGE INTO graft.t USING ...          -- key from TBLPROPERTIES
  *   OPTIMIZE graft.t; VACUUM graft.t RETAIN 3 VERSIONS
  *
  * Identifier `graft.ns…name` maps to the directory `root/ns…/name`;
  * a table is any such directory carrying `_table.meta` (written by
  * CREATE TABLE) or committed `_v<N>.manifest`s (an existing
  * path-built versioned table "adopted" by dropping it under the
  * root — zero migration). All catalog metadata is file-based and
  * KB-sized, exactly like the manifests it sits next to: no external
  * metastore, the same control-plane discipline as the table format
  * itself.
  *
  * EXECUTION PATHS, and why each lands where it does:
  *
  *  - **Reads** resolve through Spark's own catalog machinery to a
  *    [[GraftTable]] (version pinned at load — snapshot-consistent
  *    per query), which [[GraftV2Resolution]] swaps for the V1
  *    `readAtAuto` plan during analysis — the SAME trade Delta makes:
  *    the vectorized parquet scan, whole-stage codegen, and the
  *    manifest-stats pruning rule all stay on, where a hand-rolled V2
  *    `PartitionReader` would forfeit them.
  *  - **Writes** (INSERT INTO / INSERT OVERWRITE / CTAS /
  *    `saveAsTable`) go through Spark's native V2 write resolution —
  *    which validates and casts the query against the table's
  *    declared columns (store-assignment rules, the analyzer's own
  *    conformance) — then drop to a [[V1Write]] fallback whose
  *    `InsertableRelation` is one `appendWithRetry`/`overwrite`
  *    commit. Options ride as table properties: `statscols` /
  *    `bloomcols` (comma lists) index every write through the
  *    catalog.
  *  - **Row-level DML** (DELETE/UPDATE/MERGE) resolves through
  *    SPARK'S OWN analyzer since round 14: [[GraftTable]] implements
  *    `SupportsRowLevelOperations`/`SupportsDelta`
  *    ([[GraftRowLevelOperation]]), so the rewrite rules plan a
  *    distributed delta write committed as one tombstone+data
  *    manifest — NOT MATCHED BY SOURCE, column-list INSERTs,
  *    non-key merge conditions, and key-column updates all work.
  *    The merge key (composite = comma list) comes from the table's
  *    `key` property. Maintenance (OPTIMIZE/VACUUM/DESCRIBE
  *    HISTORY) keeps the parse-time text screen — Spark has no
  *    grammar for those verbs.
  *
  * At 100 TB nothing here is data-sized: loadTable reads one
  * KB-sized meta file plus one directory listing; schema comes from
  * one parquet footer of the latest version's batches.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var rootDir: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    rootDir = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog '$name' needs spark.sql.catalog.$name.root=<dir>"))
  }

  override def name(): String = catalogName

  private def fs: (FileSystem, Path) = {
    val p = new Path(rootDir)
    (p.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration), p)
  }

  private[catalog] def pathOf(parts: Seq[String]): String =
    (rootDir.stripSuffix("/") +: parts).mkString("/")

  /** The directory a (namespace…, table) identifier maps to — public
    * so path-level tooling (build guards, vacuum scripts) can reach a
    * catalog table's storage without duplicating the mapping.
    */
  def tablePath(parts: Seq[String]): String = pathOf(parts)

  private val MetaFile = "_table.meta"
  private val MetaRe = "_meta\\.(\\d+)".r
  private val ManifestRe = "_v(\\d+)\\.manifest".r

  private def isTableDir(f: FileSystem, dir: Path): Boolean =
    f.exists(new Path(dir, MetaFile)) ||
      (f.exists(dir) && f.listStatus(dir).exists { s =>
        val n = s.getPath.getName
        ManifestRe.pattern.matcher(n).matches() ||
          MetaRe.pattern.matcher(n).matches()
      })

  private[catalog] def tableDirExists(parts: Seq[String]): Boolean = {
    val (f, _) = fs
    isTableDir(f, new Path(pathOf(parts)))
  }

  /** The CURRENT metadata: the highest generation (see
    * [[GraftTableMeta]] for the versioned-generation CAS design).
    */
  private[catalog] def readMeta(parts: Seq[String]): Option[MetaState] =
    GraftTableMeta.readLatest(pathOf(parts))

  private def metaGens(parts: Seq[String]): Seq[Long] =
    GraftTableMeta.metaGens(pathOf(parts))

  private def readMetaGen(parts: Seq[String], gen: Long): MetaState =
    GraftTableMeta.readGen(pathOf(parts), gen)

  private[catalog] def metaForVersion(parts: Seq[String],
      version: Long): Option[MetaState] =
    GraftTableMeta.metaForVersion(pathOf(parts), version)

  private def writeMetaGen(parts: Seq[String], state: MetaState): Unit =
    GraftTableMeta.writeGen(pathOf(parts), state)

  /** The merge-key column declared at CREATE TABLE
    * (`TBLPROPERTIES('key'='<col>')`) — what DELETE/UPDATE/MERGE by
    * name key their tombstones on.
    */
  private[catalog] def keyOf(parts: Seq[String]): Option[String] =
    readMeta(parts).flatMap(_.props.get("key"))

  // ---- TableCatalog ------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val (f, _) = fs
    val dir = new Path(pathOf(namespace.toSeq))
    if (!f.exists(dir)) throw new NoSuchNamespaceException(
      name() +: namespace.toSeq)
    f.listStatus(dir).filter(_.isDirectory).map(_.getPath)
      .filter(isTableDir(f, _))
      .map(p => Identifier.of(namespace, p.getName))
  }

  override def loadTable(ident: Identifier): Table =
    loadAt(ident, None)

  /** Catalog time travel: `SELECT * FROM graft.t VERSION AS OF 3`. */
  override def loadTable(ident: Identifier, version: String): Table =
    loadAt(ident, Some(version.toLong))

  /** `TIMESTAMP AS OF` time travel — `timestamp` arrives as
    * MICROSECONDS since the epoch (the TableCatalog contract): the
    * newest version whose manifest LANDED at or before that instant,
    * judged by manifest file modification time — the same clock Delta
    * uses for its timestamp travel, with the same honesty caveats
    * (the writing host's clock; a vacuumed manifest removes its
    * version from the addressable range — asking below the retention
    * floor refuses loudly rather than answering with the wrong
    * version).
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val parts = identParts(ident)
    val path = pathOf(parts)
    val v = VersionedTable.versionAtTime(path, timestamp).getOrElse(
      throw new IllegalArgumentException(
        s"graft time travel: no retained version of ${parts.mkString(".")} " +
          "existed at the requested timestamp (before the first commit, " +
          "or vacuumed past the retention floor)"))
    loadAt(ident, Some(v))
  }

  private def identParts(ident: Identifier): Seq[String] =
    ident.namespace.toSeq :+ ident.name

  private def loadAt(ident: Identifier, versionAsOf: Option[Long]): Table = {
    val parts = identParts(ident)
    val path = pathOf(parts)
    val meta = readMeta(parts)
    val committed = VersionedTable.latestVersion(path)
    if (meta.isEmpty && committed.isEmpty)
      throw new NoSuchTableException(ident)
    val version = versionAsOf.orElse(committed)
    // the schema EPOCH for the pinned version: a read at a version
    // predating a RENAME/DROP COLUMN serves the names (and width) the
    // table had then — metadata time travel, zero data involvement.
    // Operational properties (key, statscols, path) always come from
    // the LATEST generation: they configure operations, not reads.
    val epoch = version.flatMap(metaForVersion(parts, _)).orElse(meta)
    // live schema = the epoch's DECLARED fields (logical names over
    // stable physical parquet names; declared-but-not-yet-written
    // columns NULL-fill on read) PLUS any content-only extras — the
    // UNION of committed batch schemas (mergeSchema, deterministic)
    // brings in columns path-level writes added without DDL, minus
    // physical columns a DROP retired. Declared types widen to the
    // content's when batches outgrew the declaration losslessly.
    val declared = epoch.map(_.schema).getOrElse(new StructType())
    val droppedLc = epoch.map(_.dropped).getOrElse(Nil)
      .map(_.toLowerCase(Locale.ROOT)).toSet
    val contentSchema = version match {
      case Some(v) =>
        // readAtWidened, not mergeSchema: a declared type widening
        // leaves batches of mixed width behind, which plain schema
        // merging refuses; the widened union is footer-bounded and
        // deterministic
        val content = VersionedTable.readAtWidenedPhysical(SparkSession.active,
          path, v).schema
        val byPhysLc = content.map(f =>
          f.name.toLowerCase(Locale.ROOT) -> f).toMap
        val reconciled = declared.map { f =>
          // a NESTED-mapped (or nested-retired) struct column never
          // reconciles against content: its content type speaks
          // PHYSICAL inner names (and may carry retired fields from
          // old batches) — unioning that with the logical type would
          // duplicate fields and resurface drops. Nested evolution is
          // DDL-driven; the declared epoch type wins.
          val nestedMapped =
            ColumnMapping.physicalType(f.dataType) !=
              ColumnMapping.logicalType(f.dataType) ||
              epoch.exists(_.dropped.exists(p => p.contains(".") &&
                p.split("\\.").head.equalsIgnoreCase(
                  ColumnMapping.physicalName(f))))
          byPhysLc.get(ColumnMapping.physicalName(f)
            .toLowerCase(Locale.ROOT)) match {
            case Some(c) if c.dataType != f.dataType && !nestedMapped =>
              // content wider than declared (pre-DDL path writes):
              // surface the lossless widening; anything else keeps
              // the content type — what the files actually hold
              val t = try VersionedTable.widenType(f.dataType, c.dataType)
                catch { case _: IllegalStateException => c.dataType }
              f.copy(dataType = t)
            case _ => f
          }
        }
        val declaredPhysLc = declared.map(f =>
          ColumnMapping.physicalName(f).toLowerCase(Locale.ROOT)).toSet
        val extras = content.filterNot { f =>
          val lc = f.name.toLowerCase(Locale.ROOT)
          declaredPhysLc(lc) || droppedLc(lc)
        }
        StructType(reconciled ++ extras)
      case None => declared
    }
    val props = meta.map(_.props).getOrElse(Map.empty) + ("path" -> path)
    // declared merge-key columns surface NON-NULLABLE: they are the
    // table's row identity (Spark's row-level operations require it,
    // NULLABLE_ROW_ID_ATTRIBUTES) — the keyed-table contract every
    // upsert/tombstone already assumes. The V1 plan swap restates
    // the claim with KnownNotNull on the scan side.
    val keyLc = props.get("key").map(graft.sql.GraftSql.splitKey)
      .getOrElse(Nil).map(_.toLowerCase(Locale.ROOT)).toSet
    val schema = StructType(contentSchema.map { f =>
      if (keyLc(f.name.toLowerCase(Locale.ROOT))) f.copy(nullable = false)
      else f
    })
    new GraftTable((name() +: parts).mkString("."), path, version, schema,
      props)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    if (partitions.nonEmpty)
      throw new UnsupportedOperationException(
        "graft tables do not take PARTITIONED BY/bucketing: batch " +
          "layout is the table's own (cluster with OPTIMIZE ... " +
          "ZORDER/RANGE BY instead)")
    val props = properties.asScala.toMap
    // provider property not persisted and not policed: a USING-less
    // CREATE TABLE arrives carrying the session default ("parquet"),
    // which is not a lie — graft tables ARE versioned parquet; the
    // catalog is what decides the format here
    val parts = identParts(ident)
    if (tableDirExists(parts)) throw new TableAlreadyExistsException(ident)
    val kept = props -- Seq(TableCatalog.PROP_PROVIDER,
      TableCatalog.PROP_OWNER, TableCatalog.PROP_LOCATION,
      TableCatalog.PROP_IS_MANAGED_LOCATION, TableCatalog.PROP_EXTERNAL)
    // 'key' accepts a comma-separated list — composite primary keys
    // (the reference's sync_runs/experiments/file_inventory shape)
    kept.get("key").foreach { spec =>
      graft.sql.GraftSql.splitKey(spec).foreach { k =>
        require(schema.isEmpty || schema.fieldNames.exists(
          _.equalsIgnoreCase(k)),
          s"TBLPROPERTIES key '$k' is not a column of the table")
      }
    }
    // CHECK constraints (`check.<name>` = boolean SQL over the
    // declared columns) must at least PARSE at declaration — a typo
    // failing at first INSERT would block writes with a worse message
    VersionedTable.checkProps(kept).foreach { case (k, v) =>
      try { SparkSession.active.sessionState.sqlParser.parseExpression(v); () }
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"graft CREATE TABLE: TBLPROPERTIES $k is not a parsable " +
            s"boolean expression: ${e.getMessage}")
      }
    }
    // nullability honesty (round 19): top-level NOT NULL is enforced
    // at the write choke point; an INNER non-null claim would be
    // stored verbatim and enforced nowhere — refuse it here rather
    // than let Catalyst trust a claim no writer validates
    GraftCatalog.refuseInnerNonNull(schema, Nil, "CREATE TABLE")
    try writeMetaGen(parts, MetaState(0L, schema, kept, since = 0L,
      dropped = Nil))
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        throw new TableAlreadyExistsException(ident)
    }
    loadTable(ident)
  }

  /** SET/UNSET TBLPROPERTIES, `ADD COLUMNS` (round 14), and — round
    * 15 — the full METADATA-ONLY schema-evolution surface:
    *
    *  - `RENAME COLUMN a TO b` — the logical name changes, the stable
    *    PHYSICAL parquet name stays ([[ColumnMapping]]): zero data
    *    rewritten, and `VERSION AS OF` a pre-rename version still
    *    reads `a` (schema epochs, below);
    *  - `DROP COLUMN c` — the field leaves the declared schema and
    *    its physical name is retired (`__dropped`), so a later ADD of
    *    the same logical name maps to a FRESH physical column and old
    *    values can never resurface. Merge-key columns refuse (row
    *    identity);
    *  - `ALTER COLUMN c TYPE t` — DECLARED lossless widening
    *    ([[VersionedTable.widenType]]'s matrix: int→long,
    *    float→double, decimal growth): old batches promote natively
    *    on scan (SPARK-40876), subsequent INSERTs conform to the
    *    widened type; lossy changes and narrowings refuse loudly.
    *
    * CONCURRENCY: every ALTER publishes a whole new metadata
    * GENERATION via exclusive create (compare-and-swap) — two
    * concurrent ALTERs can never silently lose one side's change; the
    * loser fails loudly and reruns against the new state.
    *
    * TIME TRAVEL: a shape-changing ALTER (rename/drop/type) first
    * commits a metadata-only DATA version (entries copied verbatim)
    * as the epoch boundary, then records the new schema as applying
    * from that version on (`__since`) — so `VERSION AS OF` resolves
    * names exactly as of the requested version. An ADOPTED path-built
    * table (no meta yet) synthesizes generation 0 from the committed
    * content schema first, so DDL evolution works there too.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val parts = identParts(ident)
    val path = pathOf(parts)
    val current = readMeta(parts).getOrElse {
      if (!tableDirExists(parts)) throw new NoSuchTableException(ident)
      val sch = VersionedTable.latestVersion(path)
        .map(v => VersionedTable.readAtWidenedPhysical(SparkSession.active, path, v)
          .schema)
        .getOrElse(new StructType())
      MetaState(-1L, sch, Map.empty, since = 0L, dropped = Nil)
    }
    // every physical name this table has EVER used (all generations'
    // mappings plus retired drops): a re-added logical name must map
    // to a fresh physical column, never a historical one
    def usedPhysicalLc: Set[String] =
      (metaGens(parts).map(readMetaGen(parts, _)) :+ current).flatMap { m =>
        m.dropped ++ m.schema.map(ColumnMapping.physicalName)
      }.map(_.toLowerCase(Locale.ROOT)).toSet
    var newSchema = current.schema
    var dropped = current.dropped
    var shapeChanged = false
    // columns whose NOT NULL was adopted by THIS statement (physical
    // names) — re-validated after the metadata CAS, like constraints
    var adoptedNonNull: Seq[String] = Nil
    val nextGen = math.max(current.gen, 0L) + 1
    def keyCols(props: Map[String, String]): Seq[String] =
      props.get("key").map(graft.sql.GraftSql.splitKey).getOrElse(Nil)
    def renameIn(list: String, from: String, to: String): String =
      graft.sql.GraftSql.splitKey(list)
        .map(c => if (c.equalsIgnoreCase(from)) to else c).mkString(",")
    // rename a (possibly dotted) PATH inside a column-list property:
    // exact entries and deeper prefixes both follow, per composite
    // (`a+b`) component — so statscols='meta.sz' tracks both a
    // top-level RENAME of meta and a nested RENAME of meta.sz
    def renamePathIn(list: String, fromPath: Seq[String],
        toPath: Seq[String]): String = {
      val fromLc = fromPath.map(_.toLowerCase(Locale.ROOT))
      def one(c: String): String = {
        val parts = c.split("[.]").toSeq
        if (parts.length >= fromLc.length &&
          parts.take(fromLc.length).map(_.toLowerCase(Locale.ROOT)) == fromLc)
          (toPath ++ parts.drop(fromLc.length)).mkString(".")
        else c
      }
      graft.sql.GraftSql.splitKey(list).map { c =>
        if (c.contains("+"))
          c.split("[+]").map(_.trim).map(one).mkString("+")
        else one(c)
      }.mkString(",")
    }
    def dropFrom(list: String, name: String): String =
      graft.sql.GraftSql.splitKey(list)
        .filterNot(_.equalsIgnoreCase(name)).mkString(",")
    val colProps = Seq("key", "statscols", "bloomcols")
    val updated = changes.foldLeft(current.props) {
      case (acc, set: TableChange.SetProperty) =>
        acc + (set.property -> set.value)
      case (acc, rm: TableChange.RemoveProperty) => acc - rm.property
      case (acc, add: TableChange.AddColumn) if add.fieldNames.length > 1 =>
        // NESTED ADD (round 18): the top-level contract one level
        // down — the new inner field appends at the end of its parent
        // struct, existing batches NULL-FILL it on read (the explicit
        // scan schema makes missing nested fields read as null —
        // NestedScanProbeSpec pins the reader capability), and a
        // logical name that EVER named a physical inner column at
        // this position gets a FRESH physical pin, so values dropped
        // or renamed away can never resurface under a re-added name.
        val colName = add.fieldNames.last
        require(add.isNullable,
          s"graft ALTER TABLE: added field '$colName' must be nullable " +
            "— existing rows NULL-fill on read (zero-rewrite migration)")
        val parentLogical = add.fieldNames.init.toSeq
        val parentPhys = GraftCatalog.physicalPathOf(newSchema, parentLogical)
          .getOrElse(throw new IllegalArgumentException(
            s"graft ALTER TABLE: column '${parentLogical.mkString(".")}' " +
              "does not exist or is not a struct path (structs and " +
              "array elements evolve; map entries do not)"))
        // every inner physical name EVER used at this parent position
        // across all metadata generations, plus retired nested drops
        // under it — the re-add fresh-pin discipline, one level down
        val usedInnerLc: Set[String] = {
          val all = metaGens(parts).map(readMetaGen(parts, _)) :+ current
          all.flatMap { m =>
            val fromSchema = GraftCatalog.structAtPhysical(m.schema,
              parentPhys).map(_.fields.toSeq
                .map(ColumnMapping.physicalName)).getOrElse(Nil)
            val fromDrops = m.dropped.filter(_.contains("."))
              .map(_.split("\\.").toSeq)
              .filter(d => d.length == parentPhys.length + 1 &&
                d.init.map(_.toLowerCase(Locale.ROOT)) ==
                  parentPhys.map(_.toLowerCase(Locale.ROOT)))
              .map(_.last)
            fromSchema ++ fromDrops
          }.map(_.toLowerCase(Locale.ROOT)).toSet
        }
        GraftCatalog.refuseInnerNonNull(add.dataType,
          add.fieldNames.toSeq, "ALTER TABLE ADD COLUMNS")
        var nf = org.apache.spark.sql.types.StructField(colName,
          add.dataType, nullable = true)
        Option(add.comment()).foreach { c =>
          nf = nf.copy(metadata = new org.apache.spark.sql.types
            .MetadataBuilder().withMetadata(nf.metadata)
            .putString("comment", c).build())
        }
        if (usedInnerLc(colName.toLowerCase(Locale.ROOT)))
          nf = ColumnMapping.withPhysical(nf, s"$colName#$nextGen")
        newSchema = GraftCatalog.addNestedField(newSchema, parentLogical, nf,
          add.position())
        // a POSITIONED add changes the declared order mid-struct —
        // fence like a move so the epoch presents faithfully
        if (add.position() != null) shapeChanged = true
        acc
      case (acc, add: TableChange.AddColumn) =>
        val colName = add.fieldNames.head
        require(add.isNullable,
          s"graft ALTER TABLE: added column '$colName' must be nullable " +
            "— existing rows NULL-fill on read (zero-rewrite migration)")
        require(!newSchema.fieldNames.exists(_.equalsIgnoreCase(colName)),
          s"graft ALTER TABLE: column '$colName' already exists")
        GraftCatalog.refuseInnerNonNull(add.dataType,
          add.fieldNames.toSeq, "ALTER TABLE ADD COLUMNS")
        var field = org.apache.spark.sql.types.StructField(colName,
          add.dataType, nullable = true)
        Option(add.comment()).foreach { c =>
          field = field.copy(metadata = new org.apache.spark.sql.types
            .MetadataBuilder().withMetadata(field.metadata)
            .putString("comment", c).build())
        }
        // a logical name that ever mapped to (or was) a physical
        // column gets a fresh physical name — old parquet values must
        // not resurface under a re-added name
        if (usedPhysicalLc(colName.toLowerCase(Locale.ROOT)))
          field = ColumnMapping.withPhysical(field, s"$colName#$nextGen")
        newSchema = GraftCatalog.insertAt(newSchema, field, add.position(),
          s"ADD COLUMNS '$colName'")
        if (add.position() != null) shapeChanged = true
        acc
      case (acc, rn: TableChange.RenameColumn) if rn.fieldNames.length > 1 =>
        // NESTED RENAME (round 17): metadata-only, like the top-level
        // form — the struct FIELD keeps its physical parquet name and
        // changes only its logical one; reads rename via one
        // positional cast, writes via the inverse cast
        newSchema = GraftCatalog.renameNestedField(newSchema,
          rn.fieldNames.toSeq, rn.newName)
        shapeChanged = true
        val accN = GraftCatalog.rewriteConstraintPath(acc,
          rn.fieldNames.toSeq, rn.fieldNames.init.toSeq :+ rn.newName)
        colProps.foldLeft(accN) { (a, p) =>
          a.get(p).map(v => a + (p -> renamePathIn(v,
            rn.fieldNames.toSeq, rn.fieldNames.init.toSeq :+ rn.newName)))
            .getOrElse(a)
        }
      case (acc, rn: TableChange.RenameColumn) =>
        val from = rn.fieldNames.head
        val to = rn.newName
        val idx = newSchema.fieldNames.indexWhere(_.equalsIgnoreCase(from))
        require(idx >= 0, s"graft ALTER TABLE: column '$from' does not exist")
        require(!newSchema.fieldNames.exists(_.equalsIgnoreCase(to)),
          s"graft ALTER TABLE: rename target '$to' already exists")
        val f = newSchema.fields(idx)
        // the physical name is pinned at its CURRENT value — for a
        // never-renamed column that makes the identity mapping
        // explicit from here on
        val renamed = ColumnMapping.withPhysical(
          f.copy(name = to), ColumnMapping.physicalName(f))
        newSchema = StructType(newSchema.fields.updated(idx, renamed))
        shapeChanged = true
        // CHECK constraints referencing the renamed column are
        // REWRITTEN to the new name inside this same metadata CAS
        // (round 17 — previously a refusal): the constraint's meaning
        // is unchanged, only its spelling follows the column
        val acc2 = GraftCatalog.rewriteConstraintPath(acc, Seq(from),
          Seq(to))
        colProps.foldLeft(acc2) { (a, p) =>
          a.get(p).map(v => a + (p -> renamePathIn(renameIn(v, from, to),
            Seq(from), Seq(to)))).getOrElse(a)
        }
      case (acc, del: TableChange.DeleteColumn) if del.fieldNames.length > 1 =>
        // NESTED DROP (round 17): the inner field's PHYSICAL path is
        // retired (recorded dotted: "<top-phys>.<inner-phys>…") —
        // reads project it away (`dropFields`), new batches simply
        // stop carrying it, and a later re-ADD of the same logical
        // name (round 18) finds this retired path in `usedInnerLc`
        // and pins a FRESH physical name, so stale values can never
        // resurface
        GraftCatalog.refuseConstrainedPath(acc, del.fieldNames.toSeq, "DROP")
        val (pruned, physPath) = GraftCatalog.dropNestedField(newSchema,
          del.fieldNames.toSeq, del.ifExists)
        physPath.foreach { p =>
          dropped = dropped :+ p
          shapeChanged = true
        }
        newSchema = pruned
        acc
      case (acc, del: TableChange.DeleteColumn) =>
        val name = del.fieldNames.head
        val idx = newSchema.fieldNames.indexWhere(_.equalsIgnoreCase(name))
        require(idx >= 0 || del.ifExists,
          s"graft ALTER TABLE: column '$name' does not exist")
        if (idx >= 0) {
          require(!keyCols(acc).exists(_.equalsIgnoreCase(name)),
            s"graft ALTER TABLE: cannot DROP merge-key column '$name' — " +
              "it is the table's row identity (re-key the table first " +
              "via ALTER TABLE SET TBLPROPERTIES)")
          GraftCatalog.refuseConstrainedColumn(acc, name, "DROP")
          require(newSchema.length > 1,
            "graft ALTER TABLE: cannot drop the last column")
          val f = newSchema.fields(idx)
          dropped = dropped :+ ColumnMapping.physicalName(f)
          newSchema = StructType(
            newSchema.fields.patch(idx, Nil, 1))
          shapeChanged = true
        }
        colProps.foldLeft(acc) { (a, p) =>
          a.get(p).map(v => a + (p -> dropFrom(v, name))).getOrElse(a)
        }
      case (acc, ut: TableChange.UpdateColumnType) if ut.fieldNames.length > 1 =>
        // NESTED TYPE WIDENING (round 18): the q319 lossless matrix
        // applied to an inner field — old batches carry the narrow
        // type and promote natively on scan (SPARK-40876 covers
        // nested promotions; NestedScanProbeSpec pins it), new writes
        // conform to the widened type, and VERSION AS OF a pre-DDL
        // version reads narrow (epoch boundary below). Lossy changes
        // and narrowings refuse loudly, exactly like top level.
        val (widened, changedNested) = GraftCatalog.widenNestedField(
          newSchema, ut.fieldNames.toSeq, ut.newDataType)
        newSchema = widened
        if (changedNested) shapeChanged = true
        acc
      case (acc, ut: TableChange.UpdateColumnType) =>
        val name = ut.fieldNames.head
        val idx = newSchema.fieldNames.indexWhere(_.equalsIgnoreCase(name))
        require(idx >= 0, s"graft ALTER TABLE: column '$name' does not exist")
        val f = newSchema.fields(idx)
        if (f.dataType != ut.newDataType) {
          // widenType's lossless matrix is the gate: it throws on any
          // non-widening pair, and a "widening" that lands somewhere
          // other than the requested type (ALTER int TO short) is a
          // narrowing in disguise — refuse naming the direction
          val widened = VersionedTable.widenType(f.dataType, ut.newDataType)
          require(widened == ut.newDataType,
            s"graft ALTER COLUMN TYPE: ${ut.newDataType.sql} does not " +
              s"contain ${f.dataType.sql} — only lossless widenings are " +
              "zero-rewrite (int→long, float→double, decimal growth)")
          newSchema = StructType(newSchema.fields.updated(idx,
            f.copy(dataType = ut.newDataType)))
          shapeChanged = true
        }
        acc
      case (acc, un: TableChange.UpdateColumnNullability) =>
        // NULLABILITY (round 18 — previously refused). DROP NOT NULL
        // is a pure relaxation (old epochs' claims were stronger, so
        // no fence). SET NOT NULL is the key-adoption discipline on
        // one column: every committed batch is footer-validated
        // null-free BEFORE the catalog ever claims it, the write
        // choke point enforces it for all later writers (path-level
        // included), and an epoch FENCE pins the boundary — a
        // VERSION AS OF before it keeps the old (nullable) claim,
        // because older versions may hold since-deleted NULL rows.
        // NOTE: Spark's own analyzer blocks the SQL form of SET NOT
        // NULL for V2 tables ("Cannot change nullable column to
        // non-nullable"), so that direction serves direct
        // TableCatalog.alterTable callers; the SQL-reachable adoption
        // route is a CHECK constraint (`v IS NOT NULL`) — same
        // validation, same choke point (NullabilityAlterSpec).
        require(un.fieldNames.length == 1,
          "graft ALTER TABLE: nullability edits reach top-level " +
            "columns only (nested non-null claims are not enforced " +
            "at the write choke point yet)")
        val name = un.fieldNames.head
        val idx = newSchema.fieldNames.indexWhere(_.equalsIgnoreCase(name))
        require(idx >= 0, s"graft ALTER TABLE: column '$name' does not exist")
        val f = newSchema.fields(idx)
        // a merge key's non-null claim is ROW IDENTITY — it rides
        // the 'key' property (the declared field may read nullable),
        // so the refusal cannot hide behind a declaration no-op
        if (un.nullable())
          require(!keyCols(acc).exists(_.equalsIgnoreCase(name)),
            s"graft ALTER TABLE: cannot DROP NOT NULL on merge-key " +
              s"column '$name' — it is the table's row identity " +
              "(re-key the table first via ALTER TABLE SET TBLPROPERTIES)")
        if (f.nullable != un.nullable()) {
          if (!un.nullable()) {
            VersionedTable.latestVersion(path).foreach { v =>
              VersionedTable.assertVersionColNonNull(SparkSession.active,
                path, v, ColumnMapping.physicalName(f))
            }
            adoptedNonNull = adoptedNonNull :+ ColumnMapping.physicalName(f)
            shapeChanged = true
          }
          newSchema = StructType(newSchema.fields.updated(idx,
            f.copy(nullable = un.nullable())))
        }
        acc
      case (acc, uc: TableChange.UpdateColumnComment) =>
        // COMMENTS (round 18 — previously refused): pure catalog
        // metadata riding the field's StructField metadata — never a
        // shape change, never a fence, invisible to scans
        // (physicalSchema strips metadata) and to the stream shape
        // checks (names + types only). Nested fields comment too.
        newSchema = GraftCatalog.commentField(newSchema,
          uc.fieldNames.toSeq, uc.newComment)
        acc
      case (acc, up: TableChange.UpdateColumnPosition) =>
        // POSITIONS (round 19 — previously refused): in a columnar
        // layout the declared order is pure PRESENTATION — scans
        // resolve parquet columns by (physical) NAME, so moving a
        // field reorders the declared schema and nothing else. Fenced
        // like RENAME: the declared order is part of the epoch's
        // presentation (`VERSION AS OF` a pre-move version shows the
        // old order), and the in-flight-stream shape check treats it
        // as the shape change it is.
        newSchema = GraftCatalog.moveField(newSchema,
          up.fieldNames.toSeq, up.position())
        shapeChanged = true
        acc
      case (_, other) => throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER TABLE change $other " +
          "(nullability edits are not supported — this engine never " +
          "degrades silently; adopt NOT NULL via a CHECK constraint)")
    }
    // KEY ADOPTION over existing data: declaring (or changing) the
    // merge key validates the key columns exist and every committed
    // batch is null-free under them (footer-level null counts) BEFORE
    // the catalog ever claims non-nullability — the write-side check
    // (VersionedTable.assertKeysNonNull) covers all later commits
    val newKey = updated.get("key")
      .map(graft.sql.GraftSql.splitKey).getOrElse(Nil)
    val oldKey = current.props.get("key")
      .map(graft.sql.GraftSql.splitKey).getOrElse(Nil)
    if (newKey.nonEmpty &&
      newKey.map(_.toLowerCase(Locale.ROOT)) !=
        oldKey.map(_.toLowerCase(Locale.ROOT))) {
      newKey.foreach { k =>
        require(newSchema.fieldNames.exists(_.equalsIgnoreCase(k)),
          s"graft ALTER TABLE: key column '$k' is not a column of the table")
      }
      VersionedTable.latestVersion(path).foreach { v =>
        VersionedTable.assertVersionKeysNonNull(SparkSession.active, path,
          v, ColumnMapping.colsToPhysical(newKey, newSchema))
      }
    }
    // CHECK-CONSTRAINT ADOPTION (the key-adoption discipline): a new
    // or changed `check.<name>` property must parse AND hold over
    // every committed row BEFORE the catalog ever claims it — the
    // write-side gate covers all later commits
    val newChecks = VersionedTable.checkProps(updated).filter {
      case (k, v) => !current.props.get(k).contains(v) }
    if (newChecks.nonEmpty) {
      newChecks.foreach { case (k, v) =>
        try { SparkSession.active.sessionState.sqlParser.parseExpression(v); () }
        catch {
          case e: Exception => throw new IllegalArgumentException(
            s"graft ALTER TABLE: TBLPROPERTIES $k is not a parsable " +
              s"boolean expression: ${e.getMessage}")
        }
      }
      VersionedTable.latestVersion(path).foreach { v =>
        val raw = VersionedTable.readAtWidenedPhysical(
          SparkSession.active, path, v)
        // evaluate under the POST-alter logical view, so a constraint
        // declared in the same statement as a rename speaks the names
        // the statement leaves behind
        val view = ColumnMapping.toLogical(raw,
          MetaState(nextGen, newSchema, updated, 0L, dropped))
        VersionedTable.assertChecksOnView(view, newChecks,
          "ALTER TABLE (constraint adoption)")
      }
    }
    // shape changes pin their epoch boundary with a metadata-only data
    // version FIRST (entries copied verbatim), so `VERSION AS OF` any
    // pre-ALTER version resolves under the old schema and the new
    // schema applies from the boundary on. A crash (or a lost CAS)
    // after this commit leaves a harmless content-identical version.
    val since =
      if (!shapeChanged) current.since
      else VersionedTable.latestVersion(path) match {
        case Some(_) =>
          // the fence commits BEFORE the metadata CAS, so the gate the
          // new state requires rides the fence explicitly (commits
          // after the CAS pick it up from the meta automatically): a
          // mapping-unaware reader refuses from the first manifest
          // that could expose renamed/dropped physical columns
          val feats = ColumnMapping.protocolFeatures(
            MetaState(nextGen, newSchema, updated, 0L, dropped))
          val gate =
            if (feats.nonEmpty) Seq("#protocol=" + feats.mkString(","))
            else Seq.empty
          VersionedTable.commitMetadataVersion(path, "#ddl=alter-table",
            extraHeader = gate)
        case None => 0L
      }
    GraftCatalog.testBeforeMetaWrite.foreach(_())
    try writeMetaGen(parts, MetaState(nextGen, newSchema, updated, since,
      dropped))
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"graft ALTER TABLE ${parts.mkString(".")}: a concurrent ALTER " +
            s"published metadata generation $nextGen first — this " +
            "statement published NO metadata change; re-read the table " +
            "and rerun against the new state (compare-and-swap, no " +
            "silent last-writer-wins). A content-identical '#ddl' fence " +
            "version may remain in DESCRIBE HISTORY from the lost attempt")
    }
    // ADOPTION/WRITE RACE: the metadata CAS is a separate commit from
    // data commits, so a write that read the PRE-constraint meta can
    // land violating rows between the validation above and the CAS —
    // and from the CAS on, the table would CLAIM a violated
    // constraint. Re-validate at the now-current version; on
    // violation, ROLL the constraint back (a fresh generation
    // restoring the old property state) and refuse loudly — the table
    // never stands behind a claim its data breaks. The remaining
    // sliver (a writer that read the pre-CAS meta and commits after
    // this re-check) is the same in-flight window every metadata
    // system has; the write-side gate closes it for all writers that
    // read meta after the CAS.
    if (newChecks.nonEmpty) {
      VersionedTable.latestVersion(path).foreach { v =>
        val raw = VersionedTable.readAtWidenedPhysical(
          SparkSession.active, path, v)
        val view = ColumnMapping.toLogical(raw,
          MetaState(nextGen, newSchema, updated, 0L, dropped))
        try VersionedTable.assertChecksOnView(view, newChecks,
          "ALTER TABLE (post-CAS re-validation)")
        catch {
          case e: IllegalStateException =>
            val reverted = newChecks.keys.foldLeft(updated) { (a, k) =>
              current.props.get(k) match {
                case Some(old) => a + (k -> old)
                case None => a - k
              }
            }
            try writeMetaGen(parts, MetaState(nextGen + 1, newSchema,
              reverted, since, dropped))
            catch {
              case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
                throw new IllegalStateException(
                  "graft ALTER TABLE: a concurrent write violated the " +
                    "constraint during adoption AND a concurrent ALTER " +
                    "raced the rollback — UNSET the constraint manually " +
                    s"and repair the data. Original violation: ${e.getMessage}")
            }
            throw new IllegalStateException(
              "graft ALTER TABLE: a concurrent write committed rows " +
                "violating the constraint between validation and the " +
                "metadata publish; the constraint has been ROLLED BACK " +
                s"(generation ${nextGen + 1}) — repair the data and " +
                s"rerun. Violation: ${e.getMessage}")
        }
      }
    }
    // SET NOT NULL shares the adoption/write race (round 19 —
    // ADVICE): the claim feeds Catalyst NULLABILITY (IsNotNull
    // elision), so a NULL-bearing batch landing between the
    // validation above and the CAS is worse than a stale constraint —
    // it makes query RESULTS wrong. Same remedy as constraints:
    // re-validate at the now-current version; on violation, roll the
    // claim back (a fresh generation restoring nullable) and refuse
    // loudly. The post-CAS write-side gate (declaredNonNull at the
    // choke point) closes the window for every writer that reads meta
    // after the CAS.
    if (adoptedNonNull.nonEmpty) {
      VersionedTable.latestVersion(path).foreach { v =>
        val bad = adoptedNonNull.filter { phys =>
          try {
            VersionedTable.assertVersionColNonNull(SparkSession.active,
              path, v, phys)
            false
          } catch { case _: IllegalStateException => true }
        }
        if (bad.nonEmpty) {
          val badLc = bad.map(_.toLowerCase(Locale.ROOT)).toSet
          val reverted = StructType(newSchema.fields.map { f =>
            if (badLc(ColumnMapping.physicalName(f)
                .toLowerCase(Locale.ROOT))) f.copy(nullable = true)
            else f
          })
          try writeMetaGen(parts, MetaState(nextGen + 1, reverted,
            updated, since, dropped))
          catch {
            case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
              throw new IllegalStateException(
                "graft ALTER TABLE: a concurrent write committed NULLs " +
                  "during NOT NULL adoption AND a concurrent ALTER raced " +
                  "the rollback — DROP NOT NULL manually and repair the " +
                  s"data. Columns: ${bad.mkString(", ")}")
          }
          throw new IllegalStateException(
            "graft ALTER TABLE: a concurrent write committed NULL rows " +
              "between validation and the metadata publish; the NOT NULL " +
              s"claim has been ROLLED BACK (generation ${nextGen + 1}) " +
              s"for: ${bad.mkString(", ")} — repair the data and rerun")
        }
      }
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val parts = identParts(ident)
    val (f, _) = fs
    val dir = new Path(pathOf(parts))
    if (!isTableDir(f, dir)) return false
    f.delete(dir, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val (f, _) = fs
    val from = new Path(pathOf(identParts(oldIdent)))
    val to = new Path(pathOf(identParts(newIdent)))
    if (!isTableDir(f, from)) throw new NoSuchTableException(oldIdent)
    if (isTableDir(f, to)) throw new TableAlreadyExistsException(newIdent)
    if (!f.rename(from, to))
      throw new java.io.IOException(s"rename $from -> $to failed")
  }

  // ---- SupportsNamespaces -------------------------------------------

  override def listNamespaces(): Array[Array[String]] = {
    val (f, p) = fs
    if (!f.exists(p)) return Array.empty
    f.listStatus(p).filter(_.isDirectory).map(_.getPath)
      .filterNot(isTableDir(f, _))
      .map(d => Array(d.getName))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(name() +: namespace.toSeq)

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val (f, _) = fs
    namespace.isEmpty || {
      val dir = new Path(pathOf(namespace.toSeq))
      f.exists(dir) && !isTableDir(f, dir)
    }
  }

  override def loadNamespaceMetadata(
      namespace: Array[String]): java.util.Map[String, String] =
    if (namespaceExists(namespace)) new java.util.HashMap[String, String]()
    else throw new NoSuchNamespaceException(name() +: namespace.toSeq)

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    val (f, _) = fs
    f.mkdirs(new Path(pathOf(namespace.toSeq)))
    ()
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces carry no metadata to alter")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val (f, _) = fs
    val dir = new Path(pathOf(namespace.toSeq))
    if (!f.exists(dir)) return false
    if (!cascade && f.listStatus(dir).nonEmpty)
      throw new org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException(
        (name() +: namespace.toSeq).toArray)
    f.delete(dir, true)
  }
}

object GraftCatalog {

  /** Refuse INNER non-null claims in a declared type (round 19 —
    * ADVICE): the write choke point proves NOT NULL for TOP-LEVEL
    * columns only, so a non-nullable struct field / array element /
    * map value one level down would be stored verbatim, TRUSTED by
    * Catalyst (`IsNotNull` elision, null-aware join planning), and
    * validated by no write path — NULLs could land and queries would
    * silently return wrong rows. ALTER already refuses nested
    * nullability loudly; CREATE and ADD COLUMN(S) must not accept the
    * same claim silently. The adoption route that IS enforced: declare
    * the field nullable and add a nested CHECK constraint
    * (`check.<n>` = `'meta.x IS NOT NULL'`) — same choke point,
    * validated on every committed batch.
    */
  private[catalog] def refuseInnerNonNull(dt: org.apache.spark.sql.types
      .DataType, path: Seq[String], statement: String): Unit = {
    import org.apache.spark.sql.types.{ArrayType, MapType}
    def refuse(p: Seq[String], what: String): Nothing =
      throw new IllegalArgumentException(
        s"graft $statement: $what '${p.mkString(".")}' is declared " +
          "non-nullable, but the engine enforces NOT NULL for " +
          "top-level columns only — an inner claim would be trusted " +
          "by the optimizer and validated by no write path. Declare " +
          "it nullable and adopt a CHECK constraint " +
          s"(TBLPROPERTIES 'check.<name>' = '${p.mkString(".")} IS " +
          "NOT NULL') instead — that claim IS enforced on every " +
          "committed batch")
    def walk(d: org.apache.spark.sql.types.DataType,
        p: Seq[String]): Unit = d match {
      case st: StructType => st.fields.foreach { f =>
        if (p.nonEmpty && !f.nullable) refuse(p :+ f.name, "inner field")
        walk(f.dataType, p :+ f.name)
      }
      case at: ArrayType =>
        if (!at.containsNull) refuse(p :+ "element", "array element")
        walk(at.elementType, p :+ "element")
      case mt: MapType =>
        if (!mt.valueContainsNull) refuse(p :+ "value", "map value")
        walk(mt.valueType, p :+ "value")
      case _ => ()
    }
    walk(dt, path)
  }

  /** Refuse RENAME/DROP of a column a `check.<name>` constraint
    * references — the expression text cannot follow the rename and
    * would silently go stale (Delta's constrained-column rule). The
    * reference set is the parsed expression's unresolved attribute
    * roots; an unparsable expression makes no claim (it already
    * fails loudly at enforcement).
    */
  private[catalog] def refuseConstrainedColumn(
      props: Map[String, String], column: String, verb: String): Unit =
    refuseConstrainedPath(props, Seq(column), verb)

  /** Refuse the DDL when any CHECK constraint references the logical
    * path (or anything under it) — the constraint would go
    * unresolvable, or worse, silently bind elsewhere.
    */
  private[catalog] def refuseConstrainedPath(
      props: Map[String, String], path: Seq[String], verb: String): Unit = {
    val pLc = path.map(_.toLowerCase(Locale.ROOT))
    VersionedTable.checkProps(props).foreach { case (name, sql) =>
      val refs =
        try SparkSession.active.sessionState.sqlParser
          .parseExpression(sql).collect {
            case a: org.apache.spark.sql.catalyst.analysis
                .UnresolvedAttribute =>
              a.nameParts.map(_.toLowerCase(Locale.ROOT))
          }
        catch { case scala.util.control.NonFatal(_) =>
          Seq.empty[Seq[String]] }
      if (refs.exists(r => r.length >= pLc.length && r.take(pLc.length) == pLc))
        throw new IllegalArgumentException(
          s"graft ALTER TABLE: cannot $verb column '${path.mkString(".")}' " +
            s"— CHECK constraint '${name.stripPrefix("check.")}' ($sql) " +
            "references it; drop the constraint first (ALTER TABLE " +
            "... UNSET TBLPROPERTIES)")
    }
  }

  /** Rewrite every stored CHECK-constraint expression, renaming
    * references whose logical path starts with `from` to `to` —
    * RENAME COLUMN follows the constraint's spelling inside the SAME
    * metadata CAS (round 17; previously a refusal), so the
    * constraint keeps enforcing under the new name and DESCRIBE shows
    * the rewritten SQL.
    */
  private[catalog] def rewriteConstraintPath(props: Map[String, String],
      from: Seq[String], to: Seq[String]): Map[String, String] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    val fromLc = from.map(_.toLowerCase(Locale.ROOT))
    VersionedTable.checkProps(props).foldLeft(props) {
      case (acc, (name, sql)) =>
        val parsed =
          try Some(SparkSession.active.sessionState.sqlParser
            .parseExpression(sql))
          catch { case scala.util.control.NonFatal(_) => None }
        parsed match {
          case None =>
            // an unparsable constraint cannot have its references
            // rewritten — silently skipping it would leave the stored
            // SQL speaking the OLD name (every later write fails
            // late; worse, a re-ADD of the old name would silently
            // bind the stale constraint to the new column). Refuse
            // the RENAME loudly instead.
            throw new IllegalArgumentException(
              s"graft ALTER TABLE: cannot RENAME " +
                s"'${from.mkString(".")}' — CHECK constraint " +
                s"'${name.stripPrefix("check.")}' ($sql) does not " +
                "parse, so its references cannot follow the rename; " +
                "UNSET it first (ALTER TABLE ... UNSET TBLPROPERTIES)")
          case Some(e) =>
            var changed = false
            val rewritten = e.transformUp {
              case a: UnresolvedAttribute
                  if a.nameParts.length >= fromLc.length &&
                    a.nameParts.take(fromLc.length)
                      .map(_.toLowerCase(Locale.ROOT)) == fromLc =>
                changed = true
                UnresolvedAttribute(to ++ a.nameParts.drop(fromLc.length))
            }
            if (!changed) acc else acc + (name -> rewritten.sql)
        }
    }
  }

  /** Rename the struct field at logical `path` (length >= 2) to `to`,
    * pinning its physical name — the nested twin of the top-level
    * RENAME branch. Intermediate path segments must be plain structs.
    */
  /** The refusal every nested-DDL walk shares when a path segment
    * lands on a type it cannot descend (round 19 extended the walks
    * through ARRAY elements; maps stay a loud refusal — map keys are
    * VALUES, not schema positions, so "evolving" them has no
    * metadata-only meaning).
    */
  private def refuseNotStruct(seg: String, path: Seq[String],
      dt: org.apache.spark.sql.types.DataType): Nothing =
    throw new IllegalArgumentException(
      s"graft ALTER TABLE: '$seg' in '${path.mkString(".")}' is " +
        s"${dt.sql}, not a struct — nested DDL reaches struct fields " +
        "and array elements ('col.element.field'); map entries are " +
        "not supported")

  /** Step a logical-path walk through `f.dataType`: a plain struct
    * consumes the next segment directly; an ARRAY of struct consumes
    * the literal segment "element" first (Spark's collection
    * addressing — `ALTER TABLE t ... m.element.x`). Returns the inner
    * struct, the remaining segments, and the wrapper restoring the
    * field's outer type around an updated inner struct.
    */
  private def descend(f: org.apache.spark.sql.types.StructField,
      rest: Seq[String], path: Seq[String]):
      (StructType, Seq[String], StructType => org.apache.spark.sql.types.DataType) =
    f.dataType match {
      case inner: StructType => (inner, rest, st => st)
      case at: org.apache.spark.sql.types.ArrayType
          if rest.nonEmpty && rest.head.equalsIgnoreCase("element") &&
            at.elementType.isInstanceOf[StructType] =>
        (at.elementType.asInstanceOf[StructType], rest.tail,
          st => at.copy(elementType = st))
      case other => refuseNotStruct(f.name, path, other)
    }

  /** Insert `f` into `st` at a V2 ColumnPosition: null appends (the
    * default contract), FIRST prepends, AFTER places behind the named
    * sibling. Declared order is presentation only — parquet columns
    * resolve by name — so this is always metadata-only.
    */
  private[catalog] def insertAt(st: StructType,
      f: org.apache.spark.sql.types.StructField,
      pos: TableChange.ColumnPosition, ctx: String): StructType = pos match {
    case null => st.add(f)
    case _: TableChange.First => StructType(f +: st.fields)
    case a: TableChange.After =>
      val idx = st.fieldNames.indexWhere(_.equalsIgnoreCase(a.column()))
      require(idx >= 0, s"graft ALTER TABLE: $ctx AFTER '${a.column()}' — " +
        "no such sibling field")
      StructType((st.fields.take(idx + 1) :+ f) ++ st.fields.drop(idx + 1))
    case other => throw new UnsupportedOperationException(
      s"graft ALTER TABLE: unsupported column position $other")
  }

  /** Move the field at `path` (top-level, struct, or array-element)
    * to `pos` within its containing struct — ALTER COLUMN ... FIRST /
    * AFTER, round 19. Metadata-only: the field keeps its physical
    * name, type, comment, and pin; only the declared order changes.
    */
  private[catalog] def moveField(schema: StructType, path: Seq[String],
      pos: TableChange.ColumnPosition): StructType = {
    require(pos != null, "graft ALTER TABLE: column move needs a position")
    def go(st: StructType, parts: Seq[String]): StructType = {
      val idx = st.fieldNames.indexWhere(_.equalsIgnoreCase(parts.head))
      require(idx >= 0,
        s"graft ALTER TABLE: column '${path.mkString(".")}' does not exist")
      val f = st.fields(idx)
      if (parts.length == 1)
        insertAt(StructType(st.fields.patch(idx, Nil, 1)), f, pos,
          s"'${path.mkString(".")}'")
      else {
        val (inner, rest, wrap) = descend(f, parts.tail, path)
        require(rest.nonEmpty, s"graft ALTER TABLE: " +
          s"'${path.mkString(".")}' names an array element, not a field")
        StructType(st.fields.updated(idx,
          f.copy(dataType = wrap(go(inner, rest)))))
      }
    }
    go(schema, path)
  }

  private[catalog] def renameNestedField(schema: StructType,
      path: Seq[String], to: String): StructType = {
    def go(st: StructType, parts: Seq[String]): StructType = {
      val idx = st.fieldNames.indexWhere(_.equalsIgnoreCase(parts.head))
      require(idx >= 0,
        s"graft ALTER TABLE: column '${path.mkString(".")}' does not exist")
      val f = st.fields(idx)
      if (parts.length == 1) {
        require(!st.fieldNames.exists(_.equalsIgnoreCase(to)),
          s"graft ALTER TABLE: rename target '$to' already exists in " +
            s"'${path.init.mkString(".")}'")
        StructType(st.fields.updated(idx, ColumnMapping.withPhysical(
          f.copy(name = to), ColumnMapping.physicalName(f))))
      } else {
        val (inner, rest, wrap) = descend(f, parts.tail, path)
        require(rest.nonEmpty, s"graft ALTER TABLE: " +
          s"'${path.mkString(".")}' names an array element, not a field")
        StructType(st.fields.updated(idx,
          f.copy(dataType = wrap(go(inner, rest)))))
      }
    }
    go(schema, path)
  }

  /** Append `field` to the struct at logical `parent` (length >= 1)
    * — the nested twin of the top-level ADD COLUMNS branch.
    * Intermediate path segments must be plain structs; a sibling of
    * the same name refuses.
    */
  private[catalog] def addNestedField(schema: StructType,
      parent: Seq[String],
      field: org.apache.spark.sql.types.StructField,
      pos: TableChange.ColumnPosition = null): StructType = {
    def add(inner: StructType): StructType = {
      require(!inner.fieldNames.exists(_.equalsIgnoreCase(field.name)),
        s"graft ALTER TABLE: field '${field.name}' already exists " +
          s"in '${parent.mkString(".")}'")
      insertAt(inner, field, pos, s"ADD COLUMNS '${parent.mkString(".")}'")
    }
    def go(st: StructType, parts: Seq[String]): StructType = {
      val idx = st.fieldNames.indexWhere(_.equalsIgnoreCase(parts.head))
      require(idx >= 0,
        s"graft ALTER TABLE: column '${parent.mkString(".")}' does not exist")
      val f = st.fields(idx)
      val next = f.dataType match {
        case inner: StructType =>
          if (parts.length == 1) add(inner) else go(inner, parts.tail)
        case at: org.apache.spark.sql.types.ArrayType
            if parts.length >= 2 &&
              parts(1).equalsIgnoreCase("element") &&
              at.elementType.isInstanceOf[StructType] =>
          val inner = at.elementType.asInstanceOf[StructType]
          at.copy(elementType =
            if (parts.length == 2) add(inner) else go(inner, parts.drop(2)))
        case other => refuseNotStruct(parts.head, parent, other)
      }
      StructType(st.fields.updated(idx, f.copy(dataType = next)))
    }
    go(schema, parent)
  }

  /** The PHYSICAL dotted path for a logical path, walking the schema's
    * per-field mapping level by level (None when the path does not
    * resolve to plain struct fields).
    */
  private[catalog] def physicalPathOf(schema: StructType,
      path: Seq[String]): Option[Seq[String]] = {
    def go(st: StructType, parts: Seq[String],
        acc: Seq[String]): Option[Seq[String]] = {
      val idx = st.fieldNames.indexWhere(_.equalsIgnoreCase(parts.head))
      if (idx < 0) return None
      val f = st.fields(idx)
      val phys = acc :+ ColumnMapping.physicalName(f)
      if (parts.length == 1) Some(phys)
      else f.dataType match {
        case inner: StructType => go(inner, parts.tail, phys)
        // the "element" segment is STRUCTURAL (Spark's collection
        // addressing), not a mapped field — it passes through
        // verbatim: physical paths through arrays read
        // "<phys>.element.<inner-phys>"
        case at: org.apache.spark.sql.types.ArrayType
            if parts(1).equalsIgnoreCase("element") &&
              at.elementType.isInstanceOf[StructType] =>
          val inner = at.elementType.asInstanceOf[StructType]
          if (parts.length == 2) Some(phys :+ "element")
          else go(inner, parts.drop(2), phys :+ "element")
        case _ => None
      }
    }
    go(schema, path, Seq.empty)
  }

  /** Set (or clear, via null) the `comment` metadata of the field at
    * logical `path` — top-level or nested; plain struct paths only.
    */
  private[catalog] def commentField(schema: StructType,
      path: Seq[String], comment: String): StructType = {
    def go(st: StructType, parts: Seq[String]): StructType = {
      val idx = st.fieldNames.indexWhere(_.equalsIgnoreCase(parts.head))
      require(idx >= 0,
        s"graft ALTER TABLE: column '${path.mkString(".")}' does not exist")
      val f = st.fields(idx)
      if (parts.length == 1) {
        val b = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
        val nm =
          if (comment == null) b.remove("comment").build()
          else b.putString("comment", comment).build()
        StructType(st.fields.updated(idx, f.copy(metadata = nm)))
      } else {
        val (inner, rest, wrap) = descend(f, parts.tail, path)
        require(rest.nonEmpty, s"graft ALTER TABLE: " +
          s"'${path.mkString(".")}' names an array element, not a field")
        StructType(st.fields.updated(idx,
          f.copy(dataType = wrap(go(inner, rest)))))
      }
    }
    go(schema, path)
  }

  /** The struct sitting at a PHYSICAL dotted path (None when the
    * path does not resolve in this generation's schema) — how the
    * nested-ADD fresh-pin discipline finds every inner physical name
    * a parent position ever carried.
    */
  private[catalog] def structAtPhysical(schema: StructType,
      physPath: Seq[String]): Option[StructType] = {
    def go(st: StructType, parts: Seq[String]): Option[StructType] = {
      val f = st.fields.find(f =>
        ColumnMapping.physicalName(f).equalsIgnoreCase(parts.head))
      f.map(_.dataType) match {
        case Some(inner: StructType) =>
          if (parts.length == 1) Some(inner) else go(inner, parts.tail)
        case Some(at: org.apache.spark.sql.types.ArrayType)
            if parts.length >= 2 && parts(1).equalsIgnoreCase("element") &&
              at.elementType.isInstanceOf[StructType] =>
          val inner = at.elementType.asInstanceOf[StructType]
          if (parts.length == 2) Some(inner) else go(inner, parts.drop(2))
        case _ => None
      }
    }
    go(schema, physPath)
  }

  /** Widen the struct field at logical `path` (length >= 2) to
    * `newType` under [[graft.operators.VersionedTable.widenType]]'s
    * lossless matrix, refusing lossy changes and narrowings — the
    * nested twin of the top-level ALTER COLUMN TYPE branch. The
    * field's metadata (physical pin) is preserved.
    */
  private[catalog] def widenNestedField(schema: StructType,
      path: Seq[String],
      newType: org.apache.spark.sql.types.DataType): (StructType, Boolean) = {
    var changed = false
    def go(st: StructType, parts: Seq[String]): StructType = {
      val idx = st.fieldNames.indexWhere(_.equalsIgnoreCase(parts.head))
      require(idx >= 0,
        s"graft ALTER TABLE: column '${path.mkString(".")}' does not exist")
      val f = st.fields(idx)
      if (parts.length == 1) {
        if (f.dataType == newType) st
        else {
          val widened = graft.operators.VersionedTable.widenType(
            f.dataType, newType)
          require(widened == newType,
            s"graft ALTER COLUMN TYPE: ${newType.sql} does not contain " +
              s"${f.dataType.sql} — only lossless widenings are " +
              "zero-rewrite (int→long, float→double, decimal growth)")
          changed = true
          StructType(st.fields.updated(idx, f.copy(dataType = newType)))
        }
      } else {
        val (inner, rest, wrap) = descend(f, parts.tail, path)
        require(rest.nonEmpty, s"graft ALTER TABLE: " +
          s"'${path.mkString(".")}' names an array element, not a field")
        StructType(st.fields.updated(idx,
          f.copy(dataType = wrap(go(inner, rest)))))
      }
    }
    (go(schema, path), changed)
  }

  /** Remove the struct field at logical `path` (length >= 2),
    * returning the pruned schema and the retired PHYSICAL dotted path
    * (None when `ifExists` absorbed a missing field).
    */
  private[catalog] def dropNestedField(schema: StructType,
      path: Seq[String], ifExists: Boolean): (StructType, Option[String]) = {
    val physParts = scala.collection.mutable.ListBuffer.empty[String]
    def go(st: StructType, parts: Seq[String]): Option[StructType] = {
      val idx = st.fieldNames.indexWhere(_.equalsIgnoreCase(parts.head))
      if (idx < 0) {
        require(ifExists,
          s"graft ALTER TABLE: column '${path.mkString(".")}' does not exist")
        return None
      }
      val f = st.fields(idx)
      physParts += ColumnMapping.physicalName(f)
      if (parts.length == 1) {
        require(st.length > 1,
          s"graft ALTER TABLE: cannot drop the last field of " +
            s"'${path.init.mkString(".")}' — drop the column itself")
        Some(StructType(st.fields.patch(idx, Nil, 1)))
      } else {
        val (inner, rest, wrap) = descend(f, parts.tail, path)
        require(rest.nonEmpty, s"graft ALTER TABLE: " +
          s"'${path.mkString(".")}' names an array element, not a field")
        // an array descent CONSUMED the "element" segment (length
        // check — reference identity is not stable across Seq.tail):
        // the recorded physical drop path must carry it
        if (rest.length != parts.tail.length) physParts += "element"
        go(inner, rest).map(n =>
          StructType(st.fields.updated(idx, f.copy(dataType = wrap(n)))))
      }
    }
    go(schema, path) match {
      case Some(ns) => (ns, Some(physParts.mkString(".")))
      case None => (schema, None)
    }
  }

  /** Test seam: runs between an ALTER's read-modify and its CAS write,
    * so a spec can interleave a competing metadata generation and
    * prove the loser fails loudly instead of last-writer-winning.
    */
  private[graft] var testBeforeMetaWrite: Option[() => Unit] = None
}

/** Parse-time resolver mapping `graft.ns…t` identifiers onto table
  * paths and merge keys for [[graft.sql.GraftSqlDml]] and the
  * maintenance verbs — no register() call. Resolution goes through
  * the ACTIVE SESSION's own CatalogManager (never a static registry):
  * two sessions in one JVM may configure the same catalog name with
  * different roots, and each statement must resolve against the
  * session that issued it.
  */
object GraftCatalogs {

  /** Resolve a multipart SQL identifier to a (path, key) registration:
    * `[cat, ns…, t]` when `cat` names a graft catalog of the active
    * session, or a bare `[t]` when the session's CURRENT catalog is
    * graft (USE graft) — resolved under the current namespace.
    * Returns None when the identifier is not a graft table — the
    * statement then passes through to Spark untouched. The key is the
    * table's `key` property; empty when undeclared (key-less DML
    * refuses loudly at the verb, INSERT never needs it).
    */
  def lookup(parts: Seq[String]): Option[graft.sql.GraftSql.Registration] = {
    val resolved: Option[(GraftCatalog, Seq[String])] =
      try {
        val cm = SparkSession.active.sessionState.catalogManager
        if (parts.size >= 2) {
          // a head that names no catalog (a plain database) is not an
          // error — it is simply not ours
          val cat = try cm.catalog(parts.head) catch { case _: Exception => null }
          cat match {
            case g: GraftCatalog => Some(g -> parts.tail)
            case _ => None
          }
        } else cm.currentCatalog match {
          case g: GraftCatalog =>
            Some(g -> (cm.currentNamespace.toSeq ++ parts))
          case _ => None
        }
      } catch { case _: Throwable => None }
    resolved.flatMap { case (cat, rel) =>
      if (!cat.tableDirExists(rel)) None
      else Some(graft.sql.GraftSql.Registration(cat.pathOf(rel),
        cat.keyOf(rel).map(graft.sql.GraftSql.splitKey).getOrElse(Nil)))
    }
  }

  /** Resolve a TVF's table argument — `graft_versioned('graft.t')`,
    * `graft_changes('graft.t', ...)`, `graft_history('graft.t')`
    * accept CATALOG identifiers alongside raw paths: a '/'-free
    * dotted string that resolves through the active session's
    * catalogs maps to the table's path; anything else is the path it
    * always was. Returns the storage path.
    */
  def tvfPath(arg: String): String =
    if (arg.contains("/")) arg
    else lookup(arg.split("\\.").toSeq.filter(_.nonEmpty))
      .map(_.path).getOrElse(arg)

  /** The LOGICAL view of a path-level frame for TVF results: under an
    * active column mapping (post RENAME/DROP), physical parquet
    * column names alias back to the table's current logical names,
    * retired (dropped) physical columns are projected away, and
    * passenger columns (`_change_type`) ride through — so
    * `graft_changes` over a renamed table speaks the same names its
    * batch reads do (the Delta CDF convention: the CURRENT mapping).
    * Identity (the frame itself) when the path carries no mapping.
    */
  def logicalView(df: org.apache.spark.sql.DataFrame,
      path: String): org.apache.spark.sql.DataFrame =
    GraftTableMeta.readLatest(path) match {
      case Some(m) => ColumnMapping.toLogical(df, m)
      case None => df
    }
}

/** One catalog-resolved versioned table, version-pinned at load
  * (snapshot-consistent within a query). Batch reads are swapped to
  * the V1 plan by [[GraftV2Resolution]]; writes drop to the
  * [[V1Write]] fallback below; STREAMING reads by name
  * (`spark.readStream.table("graft.t")`) go through
  * [[org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback]] —
  * Spark sees no MICRO_BATCH_READ capability, consults `v1Table`, and
  * plans the V1 `StreamSourceProvider` (the versions-as-offsets
  * source, q294) against the table's path: the same fallback Delta's
  * streaming-by-name takes, and the third face of the one documented
  * trade.
  */
class GraftTable(identName: String, val path: String,
    val snapshotVersion: Option[Long], tableSchema: StructType,
    props: Map[String, String]) extends Table with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
    with org.apache.spark.sql.graftbridge.V1FallbackTable {

  override def name(): String = identName

  /** DELETE/UPDATE/MERGE by name through SPARK'S OWN analyzer — the
    * delta-based row-level route ([[GraftRowLevelOperation]]): row
    * identity is the declared merge key, so a key-less table refuses
    * loudly here, at analysis, naming the fix.
    */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    val keyCols = graft.sql.GraftSql.splitKey(props.getOrElse("key", ""))
    if (keyCols.isEmpty)
      throw new UnsupportedOperationException(
        s"graft table $identName has no merge key: row-level " +
          "DELETE/UPDATE/MERGE need TBLPROPERTIES('key'='<col>[,<col>…]') " +
          "declared at CREATE TABLE (or added via ALTER TABLE SET " +
          "TBLPROPERTIES)")
    keyCols.foreach { k =>
      require(tableSchema.fieldNames.exists(_.equalsIgnoreCase(k)),
        s"graft table $identName: key column '$k' is not in the schema")
    }
    new GraftRowLevelBuilder(this, keyCols, info)
  }

  override def v1Table: org.apache.spark.sql.catalyst.catalog.CatalogTable = {
    import org.apache.spark.sql.catalyst.TableIdentifier
    // streaming-by-name plans the V1 source over the table PATH; the
    // source itself resolves the column mapping when the path's meta
    // activates one (round 16 — previously a loud refusal), so rows
    // arrive under the CURRENT logical names and retired columns
    // never leak; a shape-changing DDL mid-stream refuses per batch
    // naming the restart contract (GraftSource.assertMappingUnchanged)
    import org.apache.spark.sql.catalyst.catalog.{CatalogStorageFormat, CatalogTable, CatalogTableType}
    val parts = identName.split('.').toSeq
    // TableIdentifier asserts catalog => database; the identifier is
    // cosmetic here (location + provider drive the V1 source), so a
    // 2-part name records the catalog as the database slot
    val ident = parts.size match {
      case n if n >= 3 =>
        TableIdentifier(parts.last, Some(parts(n - 2)), Some(parts.head))
      case 2 => TableIdentifier(parts.last, Some(parts.head))
      case _ => TableIdentifier(parts.last)
    }
    CatalogTable(
      identifier = ident,
      tableType = CatalogTableType.EXTERNAL,
      storage = CatalogStorageFormat.empty.copy(
        locationUri = Some(new org.apache.hadoop.fs.Path(path).toUri),
        properties = Map("path" -> path)),
      schema = tableSchema,
      provider = Some("graft"))
  }

  override def schema(): StructType = tableSchema

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER)

  override def partitioning(): Array[Transform] = Array.empty

  override def properties(): java.util.Map[String, String] = props.asJava

  /** The analyzed V1 read plan this table's relation resolves to:
    * the pinned version read under the table's DECLARED schema
    * (manifest-stats pruning attached; columns an older batch
    * predates null-fill, mixed-width batches read deterministically
    * — the ALTER ADD COLUMNS contract), or an empty relation under
    * the declared schema for a created-but-never-written table.
    * Under COLUMN MAPPING the scan reads the stable PHYSICAL names
    * and a projection aliases them to the logical ones — a bare
    * alias, so filters on renamed columns still reach PushedFilters
    * (predicate pushdown rewrites through alias maps).
    */
  def readPlan(spark: SparkSession): LogicalPlan = snapshotVersion match {
    case Some(v) =>
      val physical = ColumnMapping.physicalSchema(tableSchema)
      val scan = VersionedTable.readAtWithSchema(spark, path, v, physical)
      val df =
        if (!ColumnMapping.isActive(tableSchema)) scan
        else scan.select(tableSchema.map { f =>
          val base = org.apache.spark.sql.functions
            .col(ColumnMapping.physicalName(f))
          // nested mapping: the explicit physical schema already
          // projects retired inner fields away; one positional cast
          // renames the survivors to their logical names
          val e =
            if (ColumnMapping.physicalType(f.dataType) ==
              ColumnMapping.logicalType(f.dataType)) base
            else base.cast(ColumnMapping.logicalType(f.dataType))
          e.as(f.name)
        }: _*)
      df.queryExecution.analyzed
    case None =>
      spark.createDataFrame(new java.util.ArrayList[Row](), tableSchema)
        .queryExecution.analyzed
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(path, props, tableSchema)
}

/** V1 fallback write — the same trade the streaming bridge documents,
  * on the write side: Spark's analyzer has already conformed the
  * query to the table's columns when this runs, so the insert is one
  * atomic versioned commit of a well-typed DataFrame, through the
  * identical `appendWithRetry`/`overwrite` machinery as the Scala
  * API and the path-based connector. `statscols`/`bloomcols` table
  * properties index every catalog write.
  */
private[catalog] class GraftWriteBuilder(path: String,
    props: Map[String, String], tableSchema: StructType) extends WriteBuilder
    with SupportsTruncate with SupportsOverwrite {

  private var overwriteAll = false

  override def truncate(): WriteBuilder = { overwriteAll = true; this }

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    if (filters.forall(_.isInstanceOf[AlwaysTrue])) { overwriteAll = true; this }
    else throw new UnsupportedOperationException(
      "graft catalog writes overwrite the WHOLE table (one atomic " +
        "commit); partial overwrites are DELETE + INSERT (merge-on-read)")
  }

  // LOGICAL names: appendWithRetry/overwrite translate via
  // storedCols against the CURRENT metadata — translating here too
  // would double-translate (after RENAME v TO v_old + ADD COLUMNS
  // (v ...), the pre-translated physical 'v' matches the NEW
  // logical 'v' and re-maps to the wrong column)
  private def cols(key: String): Seq[String] =
    props.get(key).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: org.apache.spark.sql.DataFrame,
            overwrite: Boolean): Unit = {
          // the analyzer conformed the query to the table's LOGICAL
          // columns (declared order); the positional rename pins the
          // LOGICAL names (identity when the analyzer already named
          // them), and appendWithRetry/overwrite's toStored is the
          // SINGLE logical->physical translation point. Translating
          // to physical names here too double-translated: after
          // RENAME v TO v_old + ADD COLUMNS (v ...), physical 'v'
          // matched the re-added logical 'v' and re-mapped to the
          // new column's physical name — colliding (every INSERT
          // refused), and a 3-rename column swap permuted silently
          val stored = data.toDF(tableSchema.fieldNames.toIndexedSeq: _*)
          val ow = overwriteAll || overwrite
          if (ow)
            VersionedTable.overwrite(stored, path,
              statsCols = cols("statscols"), bloomCols = cols("bloomcols"))
          else
            // bloomcols indexes CATALOG inserts too — the declared
            // point-lookup index must not silently lapse on the SQL
            // write path (round-16 fix: previously only overwrite
            // honored it)
            VersionedTable.appendWithRetry(stored, path,
              statsCols = cols("statscols"), bloomCols = cols("bloomcols"))
          ()
        }
      }
  }
}

/** Analysis rule (injected by `GraftExtensions`): a catalog-resolved
  * [[GraftTable]] READ relation becomes the V1 `readAtAuto` plan —
  * vectorized parquet scan, whole-stage codegen, and the
  * manifest-stats pruning rule, none of which a hand-rolled V2
  * `PartitionReader` could keep (the documented Delta trade). Write
  * commands keep their V2 relation target untouched (the V1Write
  * fallback needs it); only read positions convert. Output
  * attributes are re-aliased onto the relation's expr-ids so every
  * reference above resolves unchanged.
  */
object GraftV2Resolution extends Rule[LogicalPlan] {

  private val WriteTarget = TreeNodeTag[Boolean]("graft.write.target")

  /** The swap also serves reads the ROW-LEVEL rewrite rules build:
    * their relations wrap the table in a `RowLevelOperationTable`
    * (carrying the delta operation for the write side), but the read
    * semantics are the table's own.
    */
  private def graftOf(r: DataSourceV2Relation): Option[GraftTable] =
    r.table match {
      case g: GraftTable => Some(g)
      case other =>
        org.apache.spark.sql.graftbridge.RowLevelBridge.innerTable(other)
          .collect { case g: GraftTable => g }
    }

  /** Tag every relation in a row-level command's TARGET subtree so
    * the swap leaves it V2 until `RewriteDeleteFromTable` /
    * `RewriteUpdateTable` / `RewriteMergeIntoTable` (same fixed-point
    * batch) have matched it; the reads those rewrites build are new
    * untagged instances, swapped on a later iteration. Tags survive
    * tree copies, and this visitor re-tags every iteration anyway
    * (top-down, before children are visited).
    */
  private def tagRowLevelTarget(target: LogicalPlan): Unit =
    target.foreach {
      case r: DataSourceV2Relation => r.setTagValue(WriteTarget, true)
      case _ => ()
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsDown {
      case w: V2WriteCommand =>
        // POSITIONAL conversion inside write commands: the write
        // target is not a traversed child (V2WriteCommand is a
        // UnaryCommand over query), but the SAME relation INSTANCE
        // can appear again as a READ inside the query — Spark's
        // insert-only MERGE rewrite reuses the target relation in
        // its anti-join — so reads convert by tree position,
        // regardless of any tag the instance carries, while the
        // table field stays native for the V2 write machinery
        val newQuery = w.query.transformDown {
          case r: DataSourceV2Relation if graftOf(r).nonEmpty => convert(r)
        }
        if (newQuery eq w.query) w else w.withNewQuery(newQuery)
      case d @ org.apache.spark.sql.catalyst.plans.logical
          .DeleteFromTable(target, _) =>
        tagRowLevelTarget(target); d
      case u: org.apache.spark.sql.catalyst.plans.logical.UpdateTable =>
        tagRowLevelTarget(u.table); u
      case m: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable =>
        tagRowLevelTarget(m.targetTable); m
      case r: DataSourceV2Relation
          if graftOf(r).nonEmpty && r.getTagValue(WriteTarget).isEmpty =>
        convert(r)
    }

  private def convert(r: DataSourceV2Relation): LogicalPlan = {
    val table = graftOf(r).get
    val inner = table.readPlan(SparkSession.active)
    val byName = inner.output
      .map(a => a.name.toLowerCase(Locale.ROOT) -> a).toMap
    val projections = r.output.map { out =>
      val in = byName.getOrElse(out.name.toLowerCase(Locale.ROOT),
        throw new IllegalStateException(
          s"graft table ${table.name()}: column ${out.name} vanished " +
            "between load and resolution (concurrent overwrite?)"))
      // key columns are declared non-nullable on the relation (row
      // identity) while the parquet scan side is nullable by storage;
      // the bare alias keeps the scan-side expression so filters on
      // keys still push down to the scan (a KnownNotNull wrap here
      // measurably blocked PushedFilters) — the nullable-into-required
      // direction is exactly the keyed-table contract
      Alias(in, out.name)(exprId = out.exprId)
    }
    Project(projections, inner)
  }
}
