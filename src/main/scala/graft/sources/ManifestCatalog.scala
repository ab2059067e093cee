package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Identifier, Table,
  TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Session-catalog face of the manifested-table format — the last
  * access tier: with
  *
  * {{{
  * spark.sql.catalog.graft = graft.sources.ManifestCatalog
  * spark.sql.catalog.graft.root = /warehouse/graft
  * }}}
  *
  * plain SQL owns the whole lifecycle, no Scala in sight:
  *
  *  - `CREATE TABLE graft.orders (…)` / `CREATE TABLE graft.t AS
  *    SELECT …` — an empty table commits a manifest whose meta carries
  *    the declared schema, so the table is queryable (and insertable)
  *    before the first row.
  *  - `INSERT INTO graft.t SELECT …` / `INSERT OVERWRITE` — the
  *    [[ManifestTable]] V1Write face: the engine's parquet writer
  *    stages, one validated manifest rename publishes.
  *  - `DELETE FROM graft.t WHERE …` — SupportsDelete into the
  *    copy-on-write/MoR deleteWhere.
  *  - `SELECT * FROM graft.t VERSION AS OF 3` / `TIMESTAMP AS OF …` —
  *    TableCatalog's versioned loadTable resolves through the manifest
  *    log (timestamps via the in-manifest `#ts=` commit clock, the
  *    [[ManifestedTable.history]] clock).
  *  - `DROP TABLE graft.t`.
  *
  * Layout: one directory per table under `root` (namespaces become
  * path segments), each directory a full [[ManifestedTable]] — so the
  * object API, the anonymous `format("graft-manifest")` face, and SQL
  * all address the SAME tables and compose (a Scala MERGE is visible
  * to the next SQL SELECT at the next snapshot, OCC included).
  * Catalog state IS the filesystem: no metastore to drift from the
  * truth, listTables is one directory listing.
  */
class ManifestCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.ViewCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {
  private var catalogName: String = _
  private var root: String = _

  /** Column DEFAULT values are supported: `CREATE TABLE (c INT
    * DEFAULT 5)` / `ADD COLUMN ... DEFAULT` / `SET DEFAULT` — the
    * engine injects CURRENT defaults into INSERTs at analysis, and the
    * format's readers serve the EXISTS default (pinned at ADD time)
    * for rows physically written before the column existed.
    */
  override def capabilities(): java.util.Set[
      org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      // CHECK constraints: persisted in table properties, reported
      // back through Table.constraints() — the ENGINE's own
      // ResolveTableConstraints rule compiles enforced checks into
      // every write plan (CheckInvariant), so INSERT/UPDATE/MERGE
      // violations throw before a single file stages
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT,
      // IDENTITY + GENERATED columns: the engine VALIDATES the DDL
      // (expression determinism/references, identity start/step) when
      // these are declared; the column metadata rides the declared
      // schema into the manifest, and ENFORCEMENT is connector-side
      // (the Delta model): ManifestedTable.write mints identity
      // values from an OCC-guarded high-water mark and computes/
      // validates generated columns inline
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS,
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS)

  import ManifestCatalog.ConstraintProp

  /** Validate a CHECK predicate against the table's EXISTING rows —
    * the ADD CONSTRAINT contract: a constraint that does not hold
    * refuses (INVALID data cannot be blessed). SQL CHECK semantics:
    * only predicate = FALSE violates; NULL (unknown) passes.
    */
  private def validateCheck(dir: String, name: String,
      sql: String): Unit = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
    val spark = SparkSession.active
    val bad = spark.read.format("graft-manifest").load(dir)
      .filter(not(coalesce(expr(sql), lit(true))))
      .limit(1).count()
    if (bad > 0) throw new IllegalArgumentException(
      s"cannot ADD CONSTRAINT $name CHECK ($sql): existing rows " +
        "violate it")
  }

  override def createTable(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo): Table = {
    // constraints VALIDATE BEFORE anything mutates (a refused kind
    // must not leave a live table behind), and the accepted checks
    // ride the same properties map as user TBLPROPERTIES — one
    // creation path, no window where the table exists unenforced
    val checks = info.constraints().toSeq.map {
      case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
        s"$ConstraintProp${c.name()}" -> c.predicateSql()
      case other => throw new UnsupportedOperationException(
        s"only CHECK constraints are enforced here; got ${other.toDDL}")
    }
    val props = new java.util.HashMap[String, String](info.properties())
    checks.foreach { case (key, v) => props.put(key, v) }
    // the V2 COLUMNS carry what the bare schema does not: identity
    // specs (start/step/allowExplicitInsert) and generation
    // expressions — fold them into field METADATA under the engine's
    // own keys (IdentityColumn/GeneratedColumn), which is what the
    // manifest persists and the write-side fills read back
    import org.apache.spark.sql.catalyst.util.{GeneratedColumn,
      IdentityColumn}
    val byName = info.columns().map(c => c.name() -> c).toMap
    val schema = StructType(info.schema().fields.map { f =>
      byName.get(f.name).fold(f) { c =>
        val mb = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
        Option(c.generationExpression()).foreach(e => mb.putString(
          GeneratedColumn.GENERATION_EXPRESSION_METADATA_KEY, e))
        Option(c.identityColumnSpec()).foreach { s =>
          mb.putLong(IdentityColumn.IDENTITY_INFO_START, s.getStart)
          mb.putLong(IdentityColumn.IDENTITY_INFO_STEP, s.getStep)
          mb.putBoolean(
            IdentityColumn.IDENTITY_INFO_ALLOW_EXPLICIT_INSERT,
            s.isAllowExplicitInsert)
        }
        f.copy(metadata = mb.build())
      }
    })
    createTable(ident, schema, info.partitions(), props)
  }

  private def conf = SparkSession.active.sessionState.newHadoopConf()
  private def fs = new Path(root).getFileSystem(conf)

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null && root.nonEmpty,
      s"catalog $name needs spark.sql.catalog.$name.root")
  }
  override def name(): String = catalogName

  private def dirOf(ident: Identifier): String =
    (ident.namespace() :+ ident.name())
      .foldLeft(new Path(root))((p, s) => new Path(p, s)).toString

  private def isTable(dir: String): Boolean =
    fs.exists(new Path(new Path(dir), "_manifests"))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val base = namespace.foldLeft(new Path(root))((p, s) => new Path(p, s))
    if (!fs.exists(base)) return Array.empty
    fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && isTable(s.getPath.toString))
      .map(s => Identifier.of(namespace, s.getPath.getName))
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    isTable(dirOf(ident))

  /** `<table>.<kind>` resolves the table's METADATA relation (the
    * Iceberg convention: `SELECT * FROM graft.t.files`) — only when no
    * real table owns the name (a genuine table named `files` wins),
    * the parent IS a table, and the kind is known. Returns None
    * otherwise so the caller throws its own NoSuchTable.
    */
  private def metaTableOf(ident: Identifier,
      pinned: Option[Long]): Option[Table] = {
    if (ident.namespace().isEmpty) return None
    val kind = ident.name().toLowerCase(java.util.Locale.ROOT)
    if (!ManifestMetaTables.Names.contains(kind)) return None
    val parentDir = dirOf(
      Identifier.of(ident.namespace().init, ident.namespace().last))
    if (!isTable(parentDir)) return None
    require(pinned.isEmpty || ManifestMetaTables.SnapshotScoped(kind),
      s"metadata table '$kind' describes the whole log — VERSION AS " +
        "OF applies to the snapshot-scoped kinds only (" +
        s"${ManifestMetaTables.SnapshotScoped.mkString(",")})")
    Some(new ManifestMetaTable(kind, parentDir, pinned))
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = dirOf(ident)
    if (!isTable(dir))
      return metaTableOf(ident, None).getOrElse(
        throw new org.apache.spark.sql.catalyst.analysis
          .NoSuchTableException(ident))
    new ManifestTable(ManifestDataSource.schemaOf(dir, None), dir)
  }

  /** `VERSION AS OF v` — the snapshot pinned at load time. A
    * NON-numeric version is a REF name (the Iceberg convention): a
    * live BRANCH head (the write-audit-publish AUDIT step in plain
    * SQL), else an immutable TAG (`VERSION AS OF 'train-2026q3'` —
    * the reproducibility pin vacuum honors forever).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = dirOf(ident)
    def resolve(d: String): Long = scala.util.Try(version.toLong).getOrElse(
      ManifestedTable.branchHeadVersion(conf, d, version)
        .orElse(ManifestedTable.tagVersion(conf, d, version))
        .getOrElse(throw new IllegalArgumentException(
          s"no branch or tag '$version' under $d")))
    if (!isTable(dir)) {
      // `t.files VERSION AS OF v` — the snapshot-scoped metadata kinds
      // pin like the table itself (refs resolve against the PARENT)
      val parentDir =
        if (ident.namespace().isEmpty) dir
        else dirOf(Identifier.of(ident.namespace().init,
          ident.namespace().last))
      return metaTableOf(ident,
        if (isTable(parentDir)) Some(resolve(parentDir)) else None)
        .getOrElse(throw new org.apache.spark.sql.catalyst.analysis
          .NoSuchTableException(ident))
    }
    val v = resolve(dir)
    new ManifestTable(ManifestDataSource.schemaOf(dir, Some(v)), dir,
      pinnedVersion = Some(v))
  }

  /** `TIMESTAMP AS OF ts` — Spark hands epoch MICROS; resolved to the
    * latest version committed at or before it (manifest mtimes).
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = dirOf(ident)
    if (!isTable(dir))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(ident)
    val v = ManifestedTable.versionAtTimestamp(conf, dir, timestamp / 1000L)
    new ManifestTable(ManifestDataSource.schemaOf(dir, Some(v)), dir,
      pinnedVersion = Some(v))
  }

  /** `PARTITIONED BY` transforms → [[ManifestPartitions]] spec 0
    * (hidden partitioning): identity, bucket(n, col), days/months/
    * years over DATE columns. Validated here so an unsupported
    * transform refuses at CREATE, never at the first write.
    */
  private def parseTransforms(partitions: Array[Transform],
      schema: StructType): Seq[ManifestPartitions.PartTransform] = {
    import ManifestPartitions._
    val ts = partitions.toSeq.map { t =>
      def refName: String = {
        val refs = t.references()
        require(refs.length == 1 && refs(0).fieldNames().length == 1,
          s"unsupported partition reference in $t — one top-level " +
            "column per transform")
        refs(0).fieldNames()(0)
      }
      def litArg: Int = t.arguments().collectFirst {
        case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
          l.value().asInstanceOf[Number].intValue()
      }.getOrElse(throw new IllegalArgumentException(
        s"${t.name()} transform needs a literal width: $t"))
      t.name() match {
        case "identity" => PIdentity(refName)
        case "bucket" =>
          val n = litArg
          require(n > 0, s"bucket width must be positive, got $n")
          PBucket(n, refName)
        case "days" => PDays(refName)
        case "months" => PMonths(refName)
        case "years" => PYears(refName)
        case "hours" => PHours(refName)
        case "truncate" =>
          val w = litArg
          require(w > 0, s"truncate width must be positive, got $w")
          PTruncate(w, refName)
        case other => throw new UnsupportedOperationException(
          s"PARTITIONED BY $other is not supported — supported " +
            "transforms: identity, bucket(n, col), truncate(w, col), " +
            "days, months, years (DATE columns), hours (TIMESTAMP)")
      }
    }
    ManifestPartitions.validate(ts, schema)
    ts
  }

  @annotation.nowarn("cat=deprecation") // the StructType overload is
  // the stable creation surface; the Column-based default delegates here
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val spec = parseTransforms(partitions, schema)
    val dir = dirOf(ident)
    if (isTable(dir))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    // tables and views share the namespace symmetrically: createView
    // refuses to shadow a table, so a table must refuse to shadow a
    // view (a silent shadow would orphan the view file and resurrect
    // its stale definition at DROP TABLE)
    if (viewExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(ident)
    ManifestedTable.createEmpty(conf, dir, schema.json,
      if (spec.isEmpty) Map.empty
      else Map(ManifestPartitions.SpecsKey ->
        ManifestPartitions.encodeSpecs(Seq(spec))))
    // user TBLPROPERTIES persist in the manifest meta (engine-reserved
    // creation keys stay out); graft.dv-max-fraction is the one the
    // engine itself reads (the SQL DELETE merge-on-read dial)
    import scala.jdk.CollectionConverters._
    val userProps = properties.asScala.toMap -- Seq("provider",
      "location", "owner", "comment", "external")
    // identity minting lives on the V1 batch write path; a clustered
    // table writes through the DSv2 task writers, which do not mint —
    // refuse the combination at CREATE, never at the first insert
    require(userProps.get("graft.cluster-by").forall(_.isEmpty) ||
      !schema.fields.exists(org.apache.spark.sql.catalyst.util
        .IdentityColumn.isIdentityColumn),
      "IDENTITY columns and graft.cluster-by cannot combine: identity " +
        "values mint on the batch append path — drop one or the other")
    if (userProps.nonEmpty)
      ManifestedTable.setTableProperties(conf, dir, userProps)
    new ManifestTable(schema, dir)
  }

  /** `ALTER TABLE ... ADD COLUMNS / RENAME COLUMN / DROP COLUMN` —
    * the DDL face of the format's schema evolution, all METADATA-ONLY
    * commits (a no-file manifest version carrying the new declared
    * schema + one appended field-id epoch; zero data files move):
    *
    *  - ADD COLUMNS (top-level, nullable, un-positioned): existing
    *    rows read the column as NULL, the next INSERT resolves against
    *    the widened schema. The column gets a FRESH field id — re-using
    *    a previously dropped NAME cannot resurrect the dead id's bytes.
    *  - RENAME COLUMN: the field keeps its id; files written under the
    *    old name keep serving the column through the per-file schema
    *    epoch (`se:` token) → id → physical-name translation.
    *  - DROP COLUMN: the id leaves the current epoch; the bytes stay
    *    in place (readers project the declared schema) until
    *    compaction rewrites them away.
    *
    * Anything else (type changes, repositioning, nested fields)
    * refuses loudly.
    */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val dir = dirOf(ident)
    if (!isTable(dir))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(ident)
    val cur = ManifestDataSource.schemaOf(dir, None)
    // tables created before field-id support initialize epoch 0 from
    // the current schema — their files carry no `se:` token, which
    // reads as epoch 0: by-id equals by-name for them, exactly right
    // since no rename could have happened yet
    val epochs0 = ManifestedTable.epochsOf(
      ManifestedTable.snapshotMeta(conf, dir))
    val initEpochs =
      if (epochs0.nonEmpty) epochs0
      else Seq(ManifestedTable.leafIds(cur))
    // ids are NEVER recycled: fresh ids allocate above every id any
    // epoch ever used, so a drop + re-add cannot alias the dead id
    var maxId = initEpochs.flatMap(_.keys).maxOption.getOrElse(0)
    // legacy epochs recorded before nested ids existed track top-level
    // fields only — complete them: every nested leaf of the CURRENT
    // schema missing from the newest epoch gets a fresh id inserted
    // into EVERY epoch, spelled under that epoch's parent name (sound:
    // nested names could not change before nested evolution existed,
    // so only the top-level prefix varies across epochs)
    var epochsAll = initEpochs
    locally {
      val known = epochsAll.last.values.toSet
      val missing = ManifestedTable.leafIds(cur).toSeq.sortBy(_._1)
        .map(_._2).filter(p => p.contains('.') && !known(p))
      missing.foreach { p =>
        maxId += 1
        val id = maxId
        val top = p.takeWhile(_ != '.')
        val rest = p.substring(top.length)
        val topId = epochsAll.last.collectFirst {
          case (i, n) if n == top => i
        }
        epochsAll = epochsAll.map { e =>
          topId.flatMap(e.get) match {
            case Some(tn) => e + (id -> s"$tn$rest")
            case None => e
          }
        }
      }
    }
    var last = epochsAll.last
    var schema = cur
    var schemaChanged = false
    // nested edits walk STRUCT members only (arrays/maps are opaque
    // leaves — inner evolution there refuses via the match below)
    def mapStructAt(s0: StructType, parent: Seq[String])(
        f: StructType => StructType): StructType =
      if (parent.isEmpty) f(s0)
      else StructType(s0.fields.map { fld =>
        if (fld.name != parent.head) fld
        else fld.dataType match {
          case st: StructType =>
            fld.copy(dataType = mapStructAt(st, parent.tail)(f))
          case other => throw new IllegalArgumentException(
            s"${parent.head} is not a struct " +
              s"(${other.simpleString}) — nested ALTER walks struct " +
              "members only")
        }
      })
    def renamePaths(from: String, to: String): Unit =
      last = last.map { case (i, n) =>
        if (n == from) i -> to
        else if (n.startsWith(from + "."))
          i -> (to + n.substring(from.length))
        else i -> n
      }
    // partition-spec interplay: a RENAME of a spec source column
    // re-points the CURRENT spec (appended to the spec history — old
    // files keep their write-time spec); a DROP of one refuses loudly
    val specs0 = graft.sources.ManifestPartitions.decodeSpecs(
      ManifestedTable.snapshotMeta(conf, dir)
        .get(graft.sources.ManifestPartitions.SpecsKey))
    var curSpec = specs0.lastOption.getOrElse(Nil)
    var specChanged = false
    def renameInSpec(from: String, to: String): Unit =
      if (curSpec.exists(_.colName == from)) {
        import graft.sources.ManifestPartitions._
        curSpec = curSpec.map {
          case PIdentity(`from`) => PIdentity(to)
          case PBucket(n, `from`) => PBucket(n, to)
          case PDays(`from`) => PDays(to)
          case PMonths(`from`) => PMonths(to)
          case PYears(`from`) => PYears(to)
          case PHours(`from`) => PHours(to)
          case PTruncate(w, `from`) => PTruncate(w, to)
          case t => t
        }
        specChanged = true
      }
    val setProps = scala.collection.mutable.Map.empty[String, String]
    // CHECK-constraint interplay: a RENAME or DROP of a column a
    // stored predicate references would make every LATER write fail
    // analysis (CheckInvariant can no longer resolve the old name)
    // until the constraint is manually dropped — loud but surprising.
    // Refuse here, where the user can DROP CONSTRAINT first (Delta
    // refuses such renames for the same reason).
    lazy val checkRefs: Seq[(String, Set[String])] =
      ManifestCatalog.checkConstraintsOf(
        ManifestedTable.tableProperties(conf, dir)).map { case (n, sql) =>
        n -> ManifestCatalog.predicateColumnPaths(SparkSession.active, sql)
      }
    def refuseIfConstrained(dotted: String, what: String): Unit = {
      val lo = dotted.toLowerCase(java.util.Locale.ROOT)
      val hit = checkRefs.filter(_._2.exists(p =>
        p == lo || p.startsWith(lo + ".")))
      require(hit.isEmpty,
        s"cannot $what $dotted: CHECK constraint(s) " +
          s"${hit.map(_._1).mkString(", ")} reference it — " +
          "DROP CONSTRAINT first")
      // pending equality deletes bind their KEY columns by name — a
      // rename/drop would silently detach the masks
      val eqHit = ManifestedTable.eqDeletesAt(conf, dir)
        .filter(_.keyCols.exists(_.equalsIgnoreCase(dotted)))
      require(eqHit.isEmpty,
        s"cannot $what $dotted: ${eqHit.size} pending equality " +
          "delete(s) key on it — CALL compact to absorb them first")
    }
    changes.foreach {
      case add: TableChange.AddColumn
          if add.isNullable && add.position() == null =>
        val path = add.fieldNames().toSeq
        val dotted = path.mkString(".")
        // ADD COLUMN ... DEFAULT <expr>: the INITIAL-default split —
        // CURRENT_DEFAULT feeds future INSERTs (injected by the
        // engine's analyzer), EXISTS_DEFAULT is pinned NOW and is what
        // rows written BEFORE this column read (instead of NULL);
        // a later SET DEFAULT changes only the former
        val fieldMeta = Option(add.defaultValue()).map { dv =>
          require(path.length == 1,
            s"ADD COLUMN $dotted: DEFAULT is supported on top-level " +
              "columns only")
          val lit = new org.apache.spark.sql.catalyst.expressions.Literal(
            dv.getValue.value(), dv.getValue.dataType())
          import org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
          new org.apache.spark.sql.types.MetadataBuilder()
            .putString(
              ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY,
              Option(dv.getSql).getOrElse(lit.sql))
            .putString(
              ResolveDefaultColumns.EXISTS_DEFAULT_COLUMN_METADATA_KEY,
              lit.sql)
            .build()
        }.getOrElse(org.apache.spark.sql.types.Metadata.empty)
        if (path.length == 1) {
          val n = path.head
          require(!schema.fieldNames.contains(n),
            s"column $n already exists")
          schema = schema.add(org.apache.spark.sql.types.StructField(
            n, add.dataType(), nullable = true, metadata = fieldMeta))
          maxId += 1
          last = last + (maxId -> n)
        } else {
          // ADD inside a struct: the member appends with a FRESH id —
          // a dropped-then-re-added nested NAME never resurrects the
          // dead id's bytes (pre-add rows read NULL)
          schema = mapStructAt(schema, path.init) { st =>
            require(!st.fieldNames.contains(path.last),
              s"field $dotted already exists")
            st.add(org.apache.spark.sql.types.StructField(
              path.last, add.dataType(), nullable = true))
          }
          maxId += 1
          last = last + (maxId -> dotted)
        }
        schemaChanged = true
      case rn: TableChange.RenameColumn =>
        val path = rn.fieldNames().toSeq
        val from = path.mkString(".")
        val to = (path.init :+ rn.newName()).mkString(".")
        refuseIfConstrained(from, "RENAME COLUMN")
        if (path.length == 1) {
          require(schema.fieldNames.contains(from), s"no column $from")
          require(!schema.fieldNames.contains(rn.newName()),
            s"column ${rn.newName()} already exists")
          schema = org.apache.spark.sql.types.StructType(schema.fields.map(
            f => if (f.name == from) f.copy(name = rn.newName()) else f))
          renameInSpec(from, rn.newName())
        } else {
          // RENAME inside a struct: the member keeps its id (old files
          // keep serving the bytes through id resolution)
          schema = mapStructAt(schema, path.init) { st =>
            require(st.fieldNames.contains(path.last),
              s"no field $from")
            require(!st.fieldNames.contains(rn.newName()),
              s"field $to already exists")
            org.apache.spark.sql.types.StructType(st.fields.map(f =>
              if (f.name == path.last) f.copy(name = rn.newName()) else f))
          }
        }
        require(last.values.exists(_ == from), s"no field id for $from")
        // the renamed node AND its descendants re-path (a struct
        // rename moves every member's dotted prefix)
        renamePaths(from, to)
        schemaChanged = true
      case del: TableChange.DeleteColumn =>
        val path = del.fieldNames().toSeq
        val dotted = path.mkString(".")
        val exists =
          if (path.length == 1) schema.fieldNames.contains(dotted)
          else ManifestedTable.typeAtPath(schema, dotted).isDefined
        if (!exists) {
          if (!del.ifExists()) throw new IllegalArgumentException(
            s"no column $dotted to drop")
        } else {
          refuseIfConstrained(dotted, "DROP COLUMN")
          if (path.length == 1) {
            require(schema.length > 1, "cannot drop the last column")
            require(!curSpec.exists(_.colName == dotted),
              s"cannot DROP COLUMN $dotted: the current partition spec " +
                "transforms it — evolve the spec first " +
                "(CALL system.set_partition_spec)")
            schema = org.apache.spark.sql.types.StructType(
              schema.fields.filterNot(_.name == dotted))
          } else {
            schema = mapStructAt(schema, path.init) { st =>
              require(st.length > 1,
                s"cannot drop the last member of struct " +
                  s"${path.init.mkString(".")}")
              org.apache.spark.sql.types.StructType(
                st.fields.filterNot(_.name == path.last))
            }
          }
          // the dropped node's id AND its descendants' ids leave the
          // current epoch (dead ids — never recycled, never resurrect)
          last = last.filterNot { case (_, n) =>
            n == dotted || n.startsWith(dotted + ".")
          }
          schemaChanged = true
        }
      case up: TableChange.UpdateColumnType
          if up.fieldNames().length == 1 =>
        // LOSSLESS widenings only (the Iceberg matrix): the field id
        // and name stay; the declared type widens, and an appended
        // epoch routes reads through the translated-cast path so
        // pre-ALTER files' narrower physical values read exactly
        import org.apache.spark.sql.types.{ByteType, DoubleType,
          FloatType, IntegerType, LongType, ShortType}
        val n = up.fieldNames()(0)
        val fld = schema.fields.find(_.name == n)
          .getOrElse(throw new IllegalArgumentException(s"no column $n"))
        val to = up.newDataType()
        val ok = (fld.dataType, to) match {
          case (a, b) if a == b => true
          case (ByteType, ShortType | IntegerType | LongType |
                          DoubleType) => true
          case (ShortType, IntegerType | LongType | DoubleType) => true
          case (IntegerType, LongType | DoubleType) => true
          case (FloatType, DoubleType) => true
          case _ => false
        }
        require(ok, s"ALTER COLUMN $n TYPE: only lossless widenings " +
          s"are supported (${fld.dataType.simpleString} -> " +
          s"${to.simpleString} is not)")
        if (fld.dataType != to) {
          schema = org.apache.spark.sql.types.StructType(schema.fields
            .map(f => if (f.name == n) f.copy(dataType = to) else f))
          schemaChanged = true
        }
      case p: TableChange.SetProperty =>
        setProps += p.property() -> p.value()
      case ac: TableChange.AddConstraint =>
        ac.constraint() match {
          case c: org.apache.spark.sql.connector.catalog.constraints
              .Check =>
            // existing rows must HOLD the new check — validated with a
            // real scan before the property commits (stats-pruned like
            // any other filtered read). The commit PINS the head
            // version the scan proved: a violating INSERT landing
            // between scan and publish aborts the ADD loudly instead
            // of blessing unvalidated rows as enforced+VALID.
            val provedV = ManifestedTable.mainHeadVersion(conf, dir)
              .getOrElse(0L)
            validateCheck(dir, c.name(), c.predicateSql())
            ManifestedTable.setTableProperties(conf, dir,
              Map(s"$ConstraintProp${c.name()}" -> c.predicateSql()),
              expectHeadVersion = Some(provedV))
          case other => throw new UnsupportedOperationException(
            s"only CHECK constraints are enforced here; got ${other.toDDL}")
        }
      case dc: TableChange.DropConstraint =>
        val key = s"$ConstraintProp${dc.name()}"
        val have = ManifestedTable.tableProperties(conf, dir)
          .get(key).exists(_.nonEmpty)
        if (!have && !dc.ifExists()) throw new IllegalArgumentException(
          s"no constraint ${dc.name()} to drop")
        if (have) setProps += key -> "" // tombstone (meta merge is additive)
      case ud: TableChange.UpdateColumnDefaultValue
          if ud.fieldNames().length == 1 =>
        // SET/DROP DEFAULT moves the CURRENT default only — rows
        // written before the column keep reading the ADD-time EXISTS
        // default (the Delta/Iceberg initial-default contract: a later
        // SET DEFAULT must not rewrite history)
        import org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
        val n = ud.fieldNames()(0)
        val fld = schema.fields.find(_.name == n)
          .getOrElse(throw new IllegalArgumentException(s"no column $n"))
        val newSql = Option(ud.newCurrentDefault()).map(_.getSql)
          .orElse(Option(ud.newDefaultValue()).filter(_.nonEmpty))
        val mb = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(fld.metadata)
        mb.remove(ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY)
        newSql.foreach(sql => mb.putString(
          ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY, sql))
        schema = org.apache.spark.sql.types.StructType(schema.fields.map(
          f => if (f.name == n) f.copy(metadata = mb.build()) else f))
        schemaChanged = true
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE: supported are top-level nullable ADD COLUMNS, " +
          s"RENAME COLUMN, DROP COLUMN, lossless-widening ALTER " +
          s"COLUMN TYPE, SET/DROP DEFAULT, and SET TBLPROPERTIES; " +
          s"got $other")
    }
    if (schemaChanged)
      // expectEpochs = the RAW history this ALTER read (possibly empty
      // for a pre-field-id table): validated per commit attempt, so a
      // concurrent ALTER's epoch append is never silently dropped
      ManifestedTable.updateSchemaMeta(conf, dir, schema.json,
        Some(epochsAll :+ last), expectEpochs = Some(epochs0),
        extraMeta =
          if (!specChanged) Map.empty
          else Map(graft.sources.ManifestPartitions.SpecsKey ->
            graft.sources.ManifestPartitions.encodeSpecs(
              specs0 :+ curSpec)))
    if (setProps.nonEmpty)
      ManifestedTable.setTableProperties(conf, dir, setProps.toMap)
    new ManifestTable(schema, dir)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    if (!isTable(dir)) false
    else fs.delete(new Path(dir), true)
  }

  // ---- maintenance procedures: CALL <catalog>.system.<proc>(...) --------
  // (see [[ManifestProcedures]]; table names resolve under this
  // catalog's root, so SQL maintenance composes with every other face)

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    val ok = ident.namespace().sameElements(Array("system"))
    (if (ok) ManifestProcedures.load(ident.name(),
      tbl => dirOf(Identifier.of(Array.empty, tbl)), this) else None)
      .getOrElse(throw new RuntimeException(
        s"no procedure $ident — have system.{" +
          s"${ManifestProcedures.Names.mkString(",")}}"))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      ManifestProcedures.Names
        .map(Identifier.of(Array("system"), _)).toArray
    else Array.empty

  // ---- V2 functions: the partition transforms as a FunctionCatalog ------
  // What storage-partitioned joins resolve against: when a scan
  // reports KeyGroupedPartitioning over bucket/days/... transforms,
  // the engine loads the named function HERE (empty namespace — the
  // V2ExpressionUtils convention) and compares the two sides by the
  // bound function's canonicalName. Also callable as
  // `graft.bucket(8, k)` in SQL, which doubles as the semantics spec.

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    (if (ident.namespace().isEmpty ||
        ident.namespace().sameElements(Array("system")))
      GraftPartFunctions.unbound(ident.name()) else None)
      .getOrElse(throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(ident))

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty)
      GraftPartFunctions.Names.map(Identifier.of(Array.empty, _)).toArray
    else Array.empty

  override def functionExists(ident: Identifier): Boolean =
    (ident.namespace().isEmpty ||
      ident.namespace().sameElements(Array("system"))) &&
      GraftPartFunctions.unbound(ident.name()).isDefined

  // ---- namespaces: directories that aren't tables -----------------------
  // `SHOW TABLES IN g.ns`, `CREATE NAMESPACE` etc. — the namespace
  // tree IS the directory tree, same no-metastore discipline as tables

  private def nsPath(ns: Array[String]): Path =
    ns.foldLeft(new Path(root))((p, s) => new Path(p, s))

  override def listNamespaces(): Array[Array[String]] =
    listNamespaces(Array.empty)

  override def listNamespaces(
      namespace: Array[String]): Array[Array[String]] = {
    val base = nsPath(namespace)
    if (!fs.exists(base))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchNamespaceException(namespace)
    fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && !isTable(s.getPath.toString))
      .map(s => namespace :+ s.getPath.getName).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      (fs.exists(nsPath(namespace)) &&
        !isTable(nsPath(namespace).toString))

  override def loadNamespaceMetadata(
      namespace: Array[String]): java.util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchNamespaceException(namespace)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    if (namespaceExists(namespace) && namespace.nonEmpty)
      throw new org.apache.spark.sql.catalyst.analysis
        .NamespaceAlreadyExistsException(namespace)
    fs.mkdirs(nsPath(namespace))
    ()
  }

  override def alterNamespace(namespace: Array[String],
      changes: org.apache.spark.sql.connector.catalog.NamespaceChange*)
      : Unit =
    throw new UnsupportedOperationException(
      "namespaces carry no mutable metadata here")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace) || namespace.isEmpty) return false
    val p = nsPath(namespace)
    if (!cascade && fs.listStatus(p).nonEmpty)
      throw new org.apache.spark.sql.catalyst.analysis
        .NonEmptyNamespaceException(namespace)
    fs.delete(p, true)
  }

  // ---- SQL views: CREATE/ALTER/DROP VIEW, SHOW VIEWS --------------------
  // one view = one `<name>._view` FILE beside the table directories
  // (a file is never a table, whose marker is `_manifests`; directory
  // listings stay the single source of truth). The stored payload is
  // the query TEXT plus its creation-time resolution context — the
  // engine re-parses against that context at read time, so views
  // compose with tables, time travel, metadata tables, and each other.

  private def viewPath(ident: Identifier): Path =
    new Path(nsPath(ident.namespace()),
      ident.name() + ManifestViews.Suffix)

  override def listViews(namespace: String*): Array[Identifier] = {
    val base = nsPath(namespace.toArray)
    if (!fs.exists(base))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchNamespaceException(namespace.toArray)
    fs.listStatus(base).toSeq
      .filter(s => s.isFile &&
        s.getPath.getName.endsWith(ManifestViews.Suffix))
      .map(s => Identifier.of(namespace.toArray,
        s.getPath.getName.stripSuffix(ManifestViews.Suffix)))
      .toArray
  }

  override def viewExists(ident: Identifier): Boolean =
    fs.exists(viewPath(ident))

  override def loadView(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.View = {
    val p = viewPath(ident)
    if (!fs.exists(p))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    ManifestViews.read(fs, p, ident.name())
  }

  override def createView(
      info: org.apache.spark.sql.connector.catalog.ViewInfo)
      : org.apache.spark.sql.connector.catalog.View = {
    val ident = info.ident()
    if (isTable(dirOf(ident)))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    if (viewExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(ident)
    // the rename-without-overwrite inside write keeps racing CREATEs
    // honest: exactly one wins, the loser throws
    ManifestViews.write(fs, viewPath(ident), info, replace = false)
    loadView(ident)
  }

  override def replaceView(
      info: org.apache.spark.sql.connector.catalog.ViewInfo,
      orCreate: Boolean)
      : org.apache.spark.sql.connector.catalog.View = {
    val ident = info.ident()
    if (isTable(dirOf(ident)))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    if (!orCreate && !viewExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    ManifestViews.write(fs, viewPath(ident), info, replace = true)
    loadView(ident)
  }

  override def alterView(ident: Identifier,
      changes: org.apache.spark.sql.connector.catalog.ViewChange*)
      : org.apache.spark.sql.connector.catalog.View = {
    import org.apache.spark.sql.connector.catalog.{ViewChange, ViewInfo}
    val v = loadView(ident)
    val props = new java.util.HashMap[String, String](v.properties())
    changes.foreach {
      case sp: ViewChange.SetProperty => props.put(sp.property(), sp.value())
      case rp: ViewChange.RemoveProperty => props.remove(rp.property())
      case other => throw new UnsupportedOperationException(
        s"ALTER VIEW: unsupported change $other")
    }
    ManifestViews.write(fs, viewPath(ident),
      new ViewInfo(ident, v.query(), v.currentCatalog(),
        v.currentNamespace(), v.schema(), v.queryColumnNames(),
        v.columnAliases(), v.columnComments(), props),
      replace = true)
    loadView(ident)
  }

  override def dropView(ident: Identifier): Boolean = {
    val p = viewPath(ident)
    fs.exists(p) && fs.delete(p, false)
  }

  /** The ONE create-view implementation both DDL faces share — the
    * `CALL system.create_view` procedure and the injected
    * `CREATE [OR REPLACE] VIEW` parser command: the text must be a
    * QUERY (command/DML bodies refuse before anything runs —
    * spark.sql executes those eagerly), must not reference temp views
    * (a stored reference to one dangles in later sessions), and is
    * ANALYZED here for its schema + a loud error on bad SQL. Stored
    * with the session's current catalog/namespace so later expansions
    * re-bind identically.
    */
  def createViewFromText(spark: SparkSession, ident: Identifier,
      sql: String, replace: Boolean): Unit = {
    val parsed = spark.sessionState.sqlParser.parsePlan(sql)
    locally {
      import org.apache.spark.sql.catalyst.plans.logical._
      val mutating = parsed.isInstanceOf[Command] ||
        parsed.isInstanceOf[ParsedStatement] ||
        parsed.isInstanceOf[InsertIntoStatement] ||
        parsed.isInstanceOf[MergeIntoTable] ||
        parsed.isInstanceOf[UpdateTable] ||
        parsed.isInstanceOf[DeleteFromTable]
      require(!mutating,
        s"create view '${ident.name()}': the view text must be a " +
          s"query, not a command/DML (got ${parsed.nodeName})")
    }
    graft.plans.ResolveGraftViews.rejectTempViewRefs(
      spark, ident.name(), parsed)
    val analyzed = spark.sql(sql)
    val cm = spark.sessionState.catalogManager
    val info = new org.apache.spark.sql.connector.catalog.ViewInfo(
      ident, sql, cm.currentCatalog.name(), cm.currentNamespace,
      analyzed.schema, analyzed.schema.fieldNames,
      Array.empty[String], Array.empty[String],
      java.util.Collections.emptyMap[String, String]())
    if (replace) replaceView(info, true) else createView(info)
    ()
  }

  override def renameView(fromIdent: Identifier,
      toIdent: Identifier): Unit = {
    val from = viewPath(fromIdent)
    if (!fs.exists(from))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(fromIdent)
    val to = viewPath(toIdent)
    if (fs.exists(to) || isTable(dirOf(toIdent)))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(toIdent)
    require(fs.rename(from, to), s"rename $from -> $to failed")
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    val from = dirOf(oldIdent)
    if (!isTable(from))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(oldIdent)
    val to = dirOf(newIdent)
    if (isTable(to))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(newIdent)
    if (viewExists(newIdent))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(newIdent)
    require(fs.rename(new Path(from), new Path(to)),
      s"rename $from -> $to failed")
  }
}

object ManifestCatalog {
  /** Table-property encoding of CHECK constraints: `graft.constraint.
    * <name>` → predicate SQL; an empty value is a DROP tombstone (the
    * manifest meta merge is additive, so removal is spelled as
    * overwrite-with-empty).
    */
  private[sources] val ConstraintProp = "graft.constraint."

  private[sources] def checkConstraintsOf(
      props: Map[String, String]): Seq[(String, String)] =
    props.toSeq.collect {
      case (k, v) if k.startsWith(ConstraintProp) && v.nonEmpty =>
        (k.stripPrefix(ConstraintProp), v)
    }.sortBy(_._1)

  /** The dotted column paths a stored CHECK predicate references
    * (lower-cased) — what RENAME/DROP COLUMN checks against. Stored
    * predicates parsed at ADD time, so the Try is belt-and-braces; an
    * unparseable one contributes nothing.
    */
  private[sources] def predicateColumnPaths(spark: SparkSession,
      sql: String): Set[String] =
    scala.util.Try(spark.sessionState.sqlParser.parseExpression(sql))
      .toOption.map(_.collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          a.nameParts.mkString(".").toLowerCase(java.util.Locale.ROOT)
      }.toSet).getOrElse(Set.empty)
}
