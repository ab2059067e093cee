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
  *    log (timestamps via commit mtimes, the [[ManifestedTable.history]]
  *    clock).
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
class ManifestCatalog extends TableCatalog {
  private var catalogName: String = _
  private var root: String = _

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

  override def loadTable(ident: Identifier): Table = {
    val dir = dirOf(ident)
    if (!isTable(dir))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(ident)
    new ManifestTable(ManifestDataSource.schemaOf(dir, None), dir)
  }

  /** `VERSION AS OF v` — the snapshot pinned at load time. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = dirOf(ident)
    if (!isTable(dir))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(ident)
    val v = version.toLong
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

  @annotation.nowarn("cat=deprecation") // the StructType overload is
  // the stable creation surface; the Column-based default delegates here
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft-manifest tables cluster via compactClustered, not " +
        "partition transforms")
    val dir = dirOf(ident)
    if (isTable(dir))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    ManifestedTable.createEmpty(conf, dir, schema.json)
    new ManifestTable(schema, dir)
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER TABLE is not supported; schema evolves through widened " +
        "appends (mergeSchema reads)")

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    if (!isTable(dir)) false
    else fs.delete(new Path(dir), true)
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
    require(fs.rename(new Path(from), new Path(to)),
      s"rename $from -> $to failed")
  }
}
