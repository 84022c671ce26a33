package graft.catalog

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** V2 view support (VERDICT r11 #8): the pointer pattern tables use,
  * applied verbatim to views — an immutable uuid-named JSON metadata
  * document in the warehouse plus one `iceberg_views` pointer row (the
  * public Apache Iceberg JdbcCatalog view schema), CAS to alter. Spark 4.1
  * ships the `ViewCatalog` API without the SQL path wired, so the surface
  * is exercised programmatically ([[graft.ViewCatalogSpec]]); the day Spark
  * connects `CREATE VIEW` to V2 catalogs this is already the storage.
  */
object LakeViews {
  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  /** The persisted view definition — everything [[org.apache.spark.sql
    * .connector.catalog.View]] answers. `schemaJson` is the Spark
    * StructType JSON; comment entries may be null (Spark's arrays are
    * nullable per element).
    */
  final case class ViewDoc(
      sql: String,
      currentCatalog: String,
      currentNamespace: Seq[String],
      schemaJson: String,
      queryColumnNames: Seq[String],
      columnAliases: Seq[String],
      columnComments: Seq[String],
      properties: Map[String, String])

  /** Write an immutable view document; returns its location. */
  def write(warehouse: String, namespace: String, name: String,
      doc: ViewDoc, conf: Configuration): String = {
    val loc = s"$warehouse/_views/$namespace/$name/${java.util.UUID.randomUUID()}.json"
    val p = new Path(loc)
    val out = p.getFileSystem(conf).create(p, false)
    try out.write(mapper.writeValueAsString(doc).getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    loc
  }

  /** Best-effort reclaim of a doc whose pointer insert/CAS lost its race —
    * the doc is written BEFORE the pointer moves (the table-commit order),
    * so losers must clean up or contended view churn orphans files.
    */
  def delete(location: String, conf: Configuration): Unit =
    try {
      val p = new Path(location)
      p.getFileSystem(conf).delete(p, false)
    } catch { case _: Exception => () } // never mask the caller's outcome

  def read(location: String, conf: Configuration): ViewDoc = {
    val p = new Path(location)
    val in = p.getFileSystem(conf).open(p)
    val json = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    mapper.readValue(json, classOf[ViewDoc])
  }
}
