package graft.sources

import java.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for the reference's output layout — the modern
  * connector-API complement of the facade's `writeReferenceLayout` sink
  * (thread_pool.cc:232-242 semantics: `<job>-<reducerID>.out` files of
  * `word count` lines):
  *
  * {{{
  *   spark.read.format("graft-out").load("/path/to/outdir")
  *   // word: string, cnt: bigint, reducer_id: int
  * }}}
  *
  * A real V2 connector, not a text-file wrapper: one InputPartition per
  * `.out` file (reads parallelize per reducer output, preserving the
  * layout's natural split), paths resolved through the Hadoop
  * `FileSystem` API so `file://`, `hdfs://` and `s3a://` all work, and
  * two pushdowns the reference layout makes structural:
  *
  *   - column pruning ([[SupportsPushDownRequiredColumns]]): a
  *     `select(sum("cnt"))` never materializes word strings, and
  *     `reducer_id` comes from the FILENAME — projecting only it reads
  *     no file bytes at all;
  *   - partition pruning ([[SupportsPushDownFilters]]): `reducer_id`
  *     equality/IN filters prune whole FILES before any read (the
  *     analogue of parquet PartitionFilters; the filename is the
  *     partition value). Pushed filters are exact, so Spark drops the
  *     residual predicate.
  */
class OutTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-out"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OutSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new OutTable(properties.get("path"))
}

object OutSource {
  val Schema: StructType = StructType(Seq(
    StructField("word", StringType),
    StructField("cnt", LongType),
    StructField("reducer_id", IntegerType)))

  private val FileName = """(.+)-(\d+)\.out""".r

  /** reducer id parsed from a `<job>-<id>.out` file name (None for
    * non-layout files, which are ignored by the scan — including a
    * digit run past Int range, which toIntOption rejects instead of
    * throwing mid-planning). */
  def reducerIdOf(name: String): Option[Int] = name match {
    case FileName(_, id) => id.toIntOption
    case _ => None
  }

  /** Exact file-level pruning: keep the files whose reducer_id can
    * satisfy every pushed filter. Object-level so the spec can pin the
    * pruning logic without a FileSystem. */
  def prunePaths(files: Seq[(String, Int)], filters: Seq[Filter])
      : Seq[(String, Int)] =
    files.filter { case (_, rid) =>
      filters.forall {
        case EqualTo("reducer_id", v: Int) => rid == v
        case EqualTo("reducer_id", v: Long) => rid.toLong == v
        case In("reducer_id", vs) => vs.exists {
          case v: Int => rid == v
          case v: Long => rid.toLong == v
          case _ => false
        }
        case _ => true // not a pushable filter; kept as residual by Spark
      }
    }

  /** The subset of `filters` this source evaluates EXACTLY via file
    * pruning (safe for Spark to drop the residual). */
  def pushable(filters: Array[Filter]): Array[Filter] = filters.filter {
    case EqualTo("reducer_id", (_: Int | _: Long)) => true
    case In("reducer_id", vs) => vs.forall(v => v.isInstanceOf[Int] ||
      v.isInstanceOf[Long])
    case _ => false
  }
}

private[sources] class OutTable(path: String) extends Table with SupportsRead {
  require(path != null, "graft-out: a path is required (.load(dir))")
  override def name(): String = s"graft-out:$path"
  override def schema(): StructType = OutSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new OutScanBuilder(path)
}

private[sources] class OutScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var requiredSchema: StructType = OutSource.Schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    this.requiredSchema = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = OutSource.pushable(filters)
    // everything is returned as post-scan residual EXCEPT the exact
    // file-pruning predicates Spark may safely drop
    filters.filterNot(pushed.contains)
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new OutScan(path, requiredSchema, pushed)
}

private[sources] class OutScan(path: String, requiredSchema: StructType,
    filters: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-out $path, columns=${requiredSchema.fieldNames.mkString(",")}" +
      (if (filters.nonEmpty) s", pruned by ${filters.mkString(" and ")}" else "")

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(
      org.apache.spark.sql.SparkSession.active
        .sessionState.newHadoopConf())
    val all = fs.listStatus(dir).toSeq
      .filter(_.isFile)
      .flatMap(st => OutSource.reducerIdOf(st.getPath.getName)
        .map(rid => (st.getPath.toString, rid)))
    OutSource.prunePaths(all, filters.toSeq)
      .sortBy(_._2)
      .map { case (p, rid) => OutInputPartition(p, rid): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new OutReaderFactory(requiredSchema, new SerializableHadoopConf(
      org.apache.spark.sql.SparkSession.active
        .sessionState.newHadoopConf()))
}

private[sources] case class OutInputPartition(path: String, reducerId: Int)
  extends InputPartition

/** Java-serializable Hadoop `Configuration` carrier: the reader factory
  * is built on the driver and shipped to executors, and a bare
  * `new Configuration()` there would drop every `spark.hadoop.*` session
  * setting (s3a credentials, hdfs nameservices) that
  * `planInputPartitions` saw on the driver — the scan would plan fine
  * and then fail (or mis-auth) at read time on any non-default
  * FileSystem. `Configuration` itself is `Writable`, not
  * `Serializable`, hence the write/readFields bridge. */
private[sources] class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
  extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

private[sources] class OutReaderFactory(requiredSchema: StructType,
    conf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[OutInputPartition]
    new OutPartitionReader(p.path, p.reducerId, requiredSchema, conf.value)
  }
}

/** Streams one `.out` file. `word`/`cnt` parse from each line; a
  * projection that needs neither (e.g. `reducer_id` only, or a bare
  * count(*)) still iterates lines for row cardinality but skips the
  * split. Malformed lines fail loudly — the layout is this library's
  * own sink format, so a bad line is corruption, not dirty data. */
private[sources] class OutPartitionReader(path: String, reducerId: Int,
    requiredSchema: StructType,
    conf: org.apache.hadoop.conf.Configuration)
  extends PartitionReader[InternalRow] {
  private val fs = new Path(path).getFileSystem(conf)
  private val in = new java.io.BufferedReader(
    new java.io.InputStreamReader(fs.open(new Path(path)),
      java.nio.charset.StandardCharsets.UTF_8))
  private val needsLine = requiredSchema.fieldNames.exists(
    n => n == "word" || n == "cnt")
  private var line: String = _

  override def next(): Boolean = {
    line = in.readLine()
    line != null
  }

  override def get(): InternalRow = {
    val sep = if (needsLine) {
      val s = line.lastIndexOf(' ')
      if (s < 0) throw new IllegalStateException(
        s"graft-out: malformed line in $path: '$line'")
      s
    } else -1
    val values = requiredSchema.fieldNames.map {
      case "reducer_id" => reducerId
      case "word" => UTF8String.fromString(line.substring(0, sep))
      case "cnt" => line.substring(sep + 1).toLong
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def close(): Unit = in.close()

  // needsLine documents the projection contract; reducer_id-only scans
  // still count rows, so the line iteration itself is always required
  assert(needsLine || requiredSchema.fieldNames.forall(_ == "reducer_id"))
}
