package graft.connector

import graft.store.EmbeddedLogStore
import java.util
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._

/** DSv2 `TableCatalog`: stores addressable as SQL tables. The reference
  * has no catalog at all (every access spells out options); here
  *
  * {{{
  * --conf spark.sql.catalog.graft=graft.connector.LogServiceCatalog
  * --conf spark.sql.catalog.graft.root=/shared/stores
  *
  * CREATE TABLE graft.proj.logs (__time__ INT, msg STRING)
  *   TBLPROPERTIES ('shards'='4')
  * INSERT INTO graft.proj.logs VALUES (1700000000, 'hello')
  * SELECT msg FROM graft.proj.logs
  * SHOW TABLES IN graft.proj  /  DROP TABLE graft.proj.logs
  * }}}
  *
  * gives pure-SQL users the full connector (scan pushdown, streaming,
  * routed writes) with zero option plumbing. Namespace = project
  * (one level); a table is a store. A CREATE TABLE's column list is
  * persisted as DDL next to the store's metadata
  * ([[EmbeddedLogStore.writeTableSchema]]) so every later session —
  * including `spark.read.table` and `readStream.table` — resolves the
  * same typed shape; stores created outside the catalog surface with
  * the default 8-column string schema. Reader/writer options
  * (offsets, time range, routing column, snapshot version) pass as
  * TBLPROPERTIES at CREATE time or per-query via
  * `spark.read.option(...).table(...)`, which DSv2 merges into the
  * same option map the format("graft-logstore") path reads. */
class LogServiceCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: String = _
  private var extraOptions: Map[String, String] = Map.empty

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val opts = options.asScala.toMap
    root = opts.getOrElse("root", throw new IllegalArgumentException(
      s"catalog '$name' needs spark.sql.catalog.$name.root"))
    extraOptions = opts - "root"
  }

  override def name(): String = catalogName

  private def store = new EmbeddedLogStore(root)

  private def split(ident: Identifier): (String, String) = {
    require(ident.namespace().length == 1,
      s"graft tables are <project>.<store>, got $ident")
    (ident.namespace()(0), ident.name())
  }

  // ---- tables ---------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    require(namespace.length == 1, s"namespace must be a project")
    store.listStores(namespace(0))
      .map(t => Identifier.of(namespace, t)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val (project, name) = split(ident)
    if (!store.storeExists(project, name))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    val declared = store.readTableSchema(project, name)
    val schema = declared.map(StructType.fromDDL)
      .getOrElse(RowConverters.DefaultSchema)
    val props = store.readSourceConfig(project, name)
      .filter { case (k, _) => k.startsWith("table.") }
      .map { case (k, v) => k.stripPrefix("table.") -> v }
    new LogServiceTable(schema, LogServiceOptions(extraOptions ++ props ++ Map(
      "store.root" -> root, "store.project" -> project,
      "store.name" -> name)),
      // declared schema ⇒ strict INSERT alignment (see LogServiceTable)
      acceptAnySchema = declared.isEmpty)
  }

  /** SQL time travel: `SELECT ... FROM graft.proj.logs VERSION AS OF v`
    * pins the scan at manifest version v — exactly the
    * `store.snapshotversion` batch option (ordinal-prefix snapshot;
    * versions compacted away fail loudly). TIMESTAMP AS OF is not
    * supported: manifest versions are the store's only durable clock
    * (file mtimes are not commit metadata), and guessing from mtimes
    * would silently bind to the wrong snapshot. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"VERSION AS OF wants a manifest version number, got '$version'")
    }
    val table = loadTable(ident).asInstanceOf[LogServiceTable]
    new LogServiceTable(table.schema(),
      LogServiceOptions(table.options.all +
        ("store.snapshotversion" -> v.toString)),
      acceptAnySchema = false)
  }

  override def loadTable(ident: Identifier, timestamp: Long): Table =
    throw new UnsupportedOperationException(
      "TIMESTAMP AS OF is not supported: use VERSION AS OF <manifestVersion>")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String])
      : Table = {
    require(partitions.isEmpty,
      "graft tables shard by routing key, not by partition transforms")
    val (project, name) = split(ident)
    if (store.storeExists(project, name))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(ident)
    val props = properties.asScala.toMap
    val shards = props.getOrElse("shards", "2").toInt
    store.createStore(project, name, shards)
    if (schema.nonEmpty) store.writeTableSchema(project, name, schema.toDDL)
    // persist remaining table properties as reader/writer options under
    // the store's config (namespaced so dynamic source config coexists)
    val opts = (props - "shards").map { case (k, v) => s"table.$k" -> v }
    if (opts.nonEmpty) store.writeSourceConfig(project, name,
      store.readSourceConfig(project, name) ++ opts)
    loadTable(ident)
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER TABLE: stores are schemaless on the wire; recreate the " +
        "declared schema via DROP + CREATE")

  override def dropTable(ident: Identifier): Boolean = {
    val (project, name) = split(ident)
    store.dropStore(project, name)
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME TABLE is not supported")

  // ---- namespaces (= projects) ---------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    store.listProjects().map(p => Array(p)).toArray

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] = {
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchNamespaceException(namespace)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && store.listProjects().contains(namespace(0))

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchNamespaceException(namespace)
    Map.empty[String, String].asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    require(namespace.length == 1, "a namespace is one project level")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(root, namespace(0)))
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE not supported")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    require(namespace.length == 1, "a namespace is one project level")
    if (!namespaceExists(namespace)) return false
    val stores = store.listStores(namespace(0))
    if (stores.nonEmpty && !cascade)
      throw new IllegalStateException(
        s"namespace ${namespace(0)} holds ${stores.size} store(s); " +
          "use DROP NAMESPACE ... CASCADE")
    stores.foreach(s => store.dropStore(namespace(0), s))
    // The project dir may hold entries listStores doesn't see (a
    // half-created store without meta.json, stray files) — a flat
    // deleteIfExists would throw DirectoryNotEmptyException and leave
    // DROP NAMESPACE ... CASCADE permanently failing. Delete recursively.
    val dir = java.nio.file.Paths.get(root, namespace(0))
    if (java.nio.file.Files.exists(dir)) {
      val walk = java.nio.file.Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
    true
  }
}
