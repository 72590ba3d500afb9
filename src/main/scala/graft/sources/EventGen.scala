package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 deterministic event generator — the engine's load
  * source, mirroring the reference's load harness scenarios
  * (`/root/reference/tests/performance/load_test.py:36` drives 500
  * RPS × 30 s / 1000 RPS × 60 s of synthetic events into Kafka; here
  * the generator IS a first-class table, batch and micro-batch
  * streaming, so the same load flows through any query without Kafka).
  *
  * Every column is pure modular arithmetic on the row index — the same
  * oracle-replicability rule as the hash families: DuckDB reproduces
  * the exact dataset from `generate_series`, so queries over the
  * generated stream are hash-checkable end-to-end ([[oracleSql]]).
  *
  * Implements the full DSv2 read surface: TableProvider → Table
  * (BATCH_READ + MICRO_BATCH_READ) → ScanBuilder with COLUMN PRUNING
  * (SupportsPushDownRequiredColumns — the scan materializes only the
  * fields the query needs, asserted in SourceSpec), range-split
  * InputPartitions, and a rowsPerBatch-paced MicroBatchStream capped at
  * totalRows (so availableNow/processAllAvailable terminate).
  *
  * Options: totalRows (default 100000), numPartitions (8), rowsPerBatch
  * (streaming, default 10000), startTsMs (2024-05-05), stepMs (1000),
  * usersCard (1000).
  */
class EventGen extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = EventGen.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new EventGenTable(new CaseInsensitiveStringMap(properties))
}

object EventGen {
  val P = 999999937L
  val types: Array[String] =
    Array("page_view", "click", "scroll", "conversion", "add_to_cart")
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  // reduce i mod P BEFORE multiplying: (i%P)*a stays < 2^62 for any i,
  // where the naive i*a overflows signed 64-bit past i ≈ 3.5e9 rows —
  // and DuckDB (which promotes to HUGEINT instead of wrapping) would
  // silently diverge from the overflowed Spark values at that scale.
  // (i%P * a) % P ≡ (i*a) % P, so values are unchanged where both work.
  def h1(i: Long): Long = ((i % P) * 2654435761L + 1013904223L) % P
  def h2(i: Long): Long = ((i % P) * 2246822519L + 3266489917L) % P

  /** Column generators by field name; value = (h2 % 1000)/10 — one
    * decimal, sums stay on the 4dp rounding grid. */
  def gen(name: String, startTsMs: Long, stepMs: Long, usersCard: Long): Long => Any =
    name match {
      case "event_id"   => i => i
      case "ts"         => i => (startTsMs + i * stepMs) * 1000L // micros
      case "user_id"    => i => h1(i) % usersCard
      case "event_type" => i => UTF8String.fromString(types((h2(i) % 5).toInt))
      case "value"      => i => (h2(i) % 1000).toDouble / 10.0
    }

  /** DuckDB SQL reproducing the generated table bit-for-bit. */
  def tableSql(totalRows: Long, startTsMs: Long = 1714867200000L,
               stepMs: Long = 1000L, usersCard: Long = 1000L): String =
    s"""SELECT i AS event_id,
       |       epoch_ms($startTsMs + i * $stepMs) AS ts,
       |       (((i % $P) * 2654435761 + 1013904223) % $P) % $usersCard AS user_id,
       |       list_value('page_view','click','scroll','conversion','add_to_cart')
       |         [CAST((((i % $P) * 2246822519 + 3266489917) % $P) % 5 AS INTEGER) + 1] AS event_type,
       |       CAST((((i % $P) * 2246822519 + 3266489917) % $P) % 1000 AS DOUBLE) / 10.0 AS value
       |FROM (SELECT unnest(range(0, $totalRows)) AS i)""".stripMargin
}

class EventGenTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "eventgen"
  override def schema(): StructType = EventGen.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new EventGenScanBuilder(opts)
}

class EventGenScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = EventGen.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new EventGenScan(required, options)
}

class EventGenScan(required: StructType, options: CaseInsensitiveStringMap)
    extends Scan {
  private val totalRows = options.getLong("totalRows", 100000L)
  private val numPartitions = options.getInt("numPartitions", 8)
  private val rowsPerBatch = options.getLong("rowsPerBatch", 10000L)
  private val startTsMs = options.getLong("startTsMs", 1714867200000L)
  private val stepMs = options.getLong("stepMs", 1000L)
  private val usersCard = options.getLong("usersCard", 1000L)

  override def readSchema(): StructType = required
  override def description(): String =
    s"EventGen(totalRows=$totalRows, cols=${required.fieldNames.mkString(",")})"

  private def factory = new EventGenReaderFactory(
    required.fieldNames, startTsMs, stepMs, usersCard)

  private def split(start: Long, end: Long): Array[InputPartition] = {
    val n = math.max(1, numPartitions)
    val step = math.max(1L, (end - start + n - 1) / n)
    (start until end by step)
      .map(s => EventGenPartition(s, math.min(s + step, end)): InputPartition)
      .toArray
  }

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = split(0, totalRows)
    override def createReaderFactory(): PartitionReaderFactory = factory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream
      with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
      import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxRows}
      override def initialOffset(): Offset = EventGenOffset(0L)
      // rate control via admission control (not mutable stream state):
      // progress derives from the START offset Spark hands back, so a
      // restart from checkpoint resumes exactly where it committed
      override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)
      override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
        val s = start.asInstanceOf[EventGenOffset].n
        val step = limit match {
          case m: ReadMaxRows => m.maxRows()
          case _              => rowsPerBatch
        }
        EventGenOffset(math.min(totalRows, s + step))
      }
      override def latestOffset(): Offset =
        throw new UnsupportedOperationException(
          "latestOffset(start, limit) is used (SupportsAdmissionControl)")
      override def deserializeOffset(json: String): Offset =
        EventGenOffset(json.toLong)
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
        split(start.asInstanceOf[EventGenOffset].n, end.asInstanceOf[EventGenOffset].n)
      override def createReaderFactory(): PartitionReaderFactory = factory
      override def commit(end: Offset): Unit = ()
      override def stop(): Unit = ()
    }
}

case class EventGenOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

case class EventGenPartition(start: Long, end: Long) extends InputPartition

class EventGenReaderFactory(fields: Array[String], startTsMs: Long,
                            stepMs: Long, usersCard: Long)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[EventGenPartition]
    val gens = fields.map(EventGen.gen(_, startTsMs, stepMs, usersCard))
    new PartitionReader[InternalRow] {
      private var i = p.start - 1
      override def next(): Boolean = { i += 1; i < p.end }
      override def get(): InternalRow =
        new GenericInternalRow(gens.map(g => g(i)).asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
  }
}
