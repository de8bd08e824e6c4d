package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.dsl.{And, EqFilter, ExistsFilter, GeFilter, GtFilter, InSetFilter, LeFilter, LtFilter, MissingFilter, Parsed, SearchQuery}

/** DataSource V2 front door for the search surface (SURVEY §7 Phase
  * 3's "general SQL front door beyond the TVFs"):
  *
  * {{{
  *   spark.read.format("graft")
  *     .option("dir", "/data/corpus").option("query", "spark join")
  *     .option("k", "10").load()
  *     .where($"lang" === "en" && $"n_chars".between(100, 400))
  * }}}
  *
  * The relation is the top-k result of the raw query (Parsed grammar,
  * the index's first text field) over the corpus at `dir`: all
  * document columns plus `score`. Catalyst WHERE clauses on
  * non-text columns are PUSHED INTO THE INDEX PROBE
  * ([[SupportsPushDownFilters]] → the library's DSL filter nodes, the
  * same Occur.FILTER discipline as the reference's Filter.scala
  * hierarchy), a `LIMIT` tightens k ([[SupportsPushDownLimit]]), and
  * unused columns are pruned ([[SupportsPushDownRequiredColumns]]) —
  * EXPLAIN shows the scan's `GraftScan ... PushedFilters: [...]`
  * description, and filters arriving before the top-k is exactly what
  * makes the pushdown semantically load-bearing (top-k OF the
  * filtered set, not a filter over the top-k).
  *
  * Scale shape: the probe itself runs as the library's ordinary
  * distributed plan against the build-once cached index
  * ([[graft.search.SearchQueries.indexFor]]); only the k result rows
  * pass through the driver into the scan partition, so the scan's
  * driver state is k-bounded by construction (k is required to be
  * explicit for any scan without a LIMIT to push). */
final class GraftDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def dirOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("dir")).getOrElse(throw new IllegalArgumentException(
      "graft source requires option 'dir' (corpus directory)"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val base = SparkSession.active.read
      .parquet(s"${dirOf(options)}/documents.parquet").schema
    StructType(base.fields :+ StructField("score", DoubleType, nullable = false))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val query = Option(options.get("query")).getOrElse(
      throw new IllegalArgumentException(
        "graft source requires option 'query' (raw query string)"))
    val k = Option(options.get("k")).map(_.toInt).getOrElse(10)
    require(k > 0, s"graft source: k must be positive, got $k")
    GraftTable(schema, dirOf(options), query, k)
  }

  override def supportsExternalMetadata(): Boolean = true
}

final case class GraftTable(tableSchema: StructType, dir: String,
    query: String, k: Int) extends Table with SupportsRead {
  override def name(): String = s"graft:$dir"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(tableSchema, dir, query, k)
}

/** Translates Catalyst source filters into the library's DSL filter
  * nodes. Text-field and score predicates are NOT pushed (a text
  * equality is not index semantics; score exists only post-probe) —
  * they come back as postScanFilters and Spark evaluates them. */
final class GraftScanBuilder(fullSchema: StructType, dir: String,
    query: String, k0: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownLimit
    with SupportsPushDownRequiredColumns {

  private var k = k0
  private var accepted = Array.empty[Filter]
  private var dslFilters = Seq.empty[SearchQuery]
  private var required: StructType = fullSchema

  /** Fields the probe may filter on: any document column except the
    * analyzed text fields and the synthetic score. */
  private def pushable(name: String): Boolean =
    name != "score" && name != "text" && fullSchema.fieldNames.contains(name)

  private def toDsl(f: Filter): Option[SearchQuery] = f match {
    case EqualTo(a, v) if pushable(a) => Some(EqFilter(a, v))
    case GreaterThan(a, v) if pushable(a) => Some(GtFilter(a, v))
    case GreaterThanOrEqual(a, v) if pushable(a) => Some(GeFilter(a, v))
    case LessThan(a, v) if pushable(a) => Some(LtFilter(a, v))
    case LessThanOrEqual(a, v) if pushable(a) => Some(LeFilter(a, v))
    case In(a, vs) if pushable(a) => Some(InSetFilter(a, vs.toSeq))
    case IsNotNull(a) if pushable(a) => Some(ExistsFilter(a))
    case IsNull(a) if pushable(a) => Some(MissingFilter(a))
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition(f => toDsl(f).isDefined)
    accepted = ok
    dslFilters = ok.toSeq.flatMap(toDsl)
    rest
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pushLimit(limit: Int): Boolean = {
    k = math.min(k, limit)
    true
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    GraftScan(required, dir, query, k, dslFilters,
      accepted.map(_.toString).toSeq)
}

/** The k-bounded scan: one partition carrying the probe's result rows
  * (external JVM values, converted to catalyst rows executor-side). */
final case class GraftScan(readSchema: StructType, dir: String,
    query: String, k: Int, dslFilters: Seq[SearchQuery],
    pushedDesc: Seq[String]) extends Scan with Batch {

  override def description(): String =
    s"GraftScan dir=$dir, query='$query', k=$k, " +
      s"PushedFilters: [${pushedDesc.mkString(", ")}]"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val idx = graft.search.SearchQueries.indexFor(spark, dir)
    val field = idx.spec.textFields.head
    val ast = dslFilters.foldLeft[SearchQuery](Parsed(field, query))(And(_, _))
    val hits = idx.search(ast, k)
    val cols = if (readSchema.isEmpty) Seq(org.apache.spark.sql.functions.lit(0))
      else readSchema.fieldNames.toSeq.map(org.apache.spark.sql.functions.col)
    val rows: Array[Array[Any]] = hits.select(cols: _*).collect()
      .map(r => (0 until r.length).map(r.get).toArray)
    Array(GraftResultPartition(
      if (readSchema.isEmpty) rows.map(_ => Array.empty[Any]) else rows))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftReaderFactory(readSchema)
}

final case class GraftResultPartition(rows: Array[Array[Any]])
  extends InputPartition

final case class GraftReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[GraftResultPartition].rows
    val converters = schema.fields.map(f =>
      CatalystTypeConverters.createToCatalystConverter(f.dataType))
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow =
        InternalRow.fromSeq(rows(i).toIndexedSeq.zip(converters.toIndexedSeq)
          .map { case (v, c) => c(v) })
      override def close(): Unit = ()
    }
  }
}
