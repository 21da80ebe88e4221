package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ctran.Schemas

/** DataSource V2 for the reference's array-framed JSON files (S4): the
  * `file_consumer` writes one top-level JSON ARRAY of breadcrumb objects
  * per day. The multiLine JSON reader handles these
  * (`ctran.Load.readRawJson`); this connector makes the framing a
  * first-class format —
  *
  * {{{ spark.read.format("graft-jsonarray").load(dir) }}}
  *
  * — with the DSv2 contract a 100 TB source needs:
  *  - one input partition PER FILE (array framing has no intra-file
  *    split points — the multiLine reader has the same granularity, so
  *    parallelism = file count; the writer keeps files day-sized);
  *  - COLUMN PRUNING pushed into the parser
  *    (SupportsPushDownRequiredColumns): unprojected fields are
  *    token-skipped, never materialized — `select(one column)` parses
  *    one field per object instead of eight;
  *  - STREAMING parse (Jackson token iterator): a file never needs to
  *    fit in memory as a string, unlike naive whole-file approaches.
  *
  * Fields land as strings, exactly as the declared ingest contract
  * (`Schemas.rawBreadcrumb` — typing happens in the transform).
  * Unknown object fields are skipped; missing fields are null.
  */
class JsonArraySource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-jsonarray"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Schemas.rawBreadcrumb

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new JsonArrayTable(schema, properties.get("path"))
}

private[sources] class JsonArrayTable(schema: StructType, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft-jsonarray:$path"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new JsonArrayScanBuilder(schema,
      Option(path).getOrElse(options.get("path")))
}

private[sources] class JsonArrayScanBuilder(full: StructType, path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new JsonArrayScan(required, path)
}

private[sources] case class JsonFilePartition(file: String) extends InputPartition

private[sources] class JsonArrayScan(required: StructType, path: String)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // the SESSION's Hadoop conf (spark.hadoop.* — object-store credentials,
  // fs.defaultFS, …), not a bare `new Configuration()` that would only see
  // cluster defaults; planned on the driver, shipped to readers as entries
  private def hadoopConf: Configuration =
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf)
    // Recurse: day-partitioned layouts nest files under subdirectories,
    // and a top-level-only listing would silently read fewer rows. A
    // file is hidden iff ANY path component below the root is
    // underscore/dot-prefixed (same rule as Spark's file index — covers
    // files inside `_temporary`/dot-staging dirs, not just hidden names).
    def hidden(f: Path): Boolean = {
      var cur = f
      while (cur != null && cur != p) {
        val n = cur.getName
        if (n.startsWith("_") || n.startsWith(".")) return true
        cur = cur.getParent
      }
      false
    }
    val files =
      if (fs.getFileStatus(p).isDirectory) {
        val it = fs.listFiles(p, true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
        while (it.hasNext) {
          val f = it.next().getPath
          if (!hidden(f)) buf += f
        }
        buf.toArray
      } else Array(p)
    files.sortBy(_.toString)
      .map(f => JsonFilePartition(f.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val entries = hadoopConf.asScala.map(e => e.getKey -> e.getValue).toMap
    new JsonArrayReaderFactory(required.fieldNames, entries)
  }
}

/** Serializable factory: projected field names + the session Hadoop conf
  * as plain entries (rebuilt executor-side). */
private[sources] class JsonArrayReaderFactory(fields: Array[String],
    confEntries: Map[String, String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new JsonArrayReader(partition.asInstanceOf[JsonFilePartition].file,
      fields, confEntries)
}

private[sources] class JsonArrayReader(file: String, fields: Array[String],
    confEntries: Map[String, String]) extends PartitionReader[InternalRow] {
  private val idx: Map[String, Int] = fields.zipWithIndex.toMap
  private val in = {
    val conf = new Configuration(false)
    confEntries.foreach { case (k, v) => conf.set(k, v) }
    val p = new Path(file)
    p.getFileSystem(conf).open(p)
  }
  // the framing check throws for non-array files; the opened stream must
  // not leak with it (close() is never called on a reader that failed
  // construction)
  private val parser = try {
    val pr = new JsonFactory().createParser(in: java.io.InputStream)
    require(pr.nextToken() == JsonToken.START_ARRAY,
      s"$file is not an array-framed JSON file")
    pr
  } catch { case e: Throwable => in.close(); throw e }
  private var row: InternalRow = _

  override def next(): Boolean = parser.nextToken() match {
    case JsonToken.START_OBJECT =>
      val values = new Array[Any](fields.length)
      while (parser.nextToken() == JsonToken.FIELD_NAME) {
        val name = parser.currentName()
        parser.nextToken() // move onto the value
        idx.get(name) match {
          case Some(i) if parser.currentToken().isScalarValue &&
              parser.currentToken() != JsonToken.VALUE_NULL =>
            values(i) = UTF8String.fromString(parser.getValueAsString)
          case _ =>
            // unprojected, null, or non-scalar (a projected field holding
            // an object/array reads as null): skip the WHOLE value —
            // getValueAsString on START_OBJECT would leave the nested
            // tokens unconsumed and desync every row after it
            parser.skipChildren()
        }
      }
      row = new GenericInternalRow(values)
      true
    case _ => false // END_ARRAY (or EOF)
  }

  override def get(): InternalRow = row
  override def close(): Unit = { parser.close(); in.close() }
}
