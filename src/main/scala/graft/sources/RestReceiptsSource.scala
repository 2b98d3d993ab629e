package graft.sources

import graft.ingest.PosApiClient
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.time.Instant

/** S1-stretch — the paginated REST source as a DataSource V2
  * `TableProvider` (SURVEY §2.1; reference `etl/extract.py:107-167`).
  *
  * The round-1 ingest fetches on the driver — faithful to the reference
  * (one upstream, ~175 receipts/day) but a driver bottleneck if the API
  * ever serves real volume. This source splits the requested
  * `[updated_at_min, updated_at_max]` range into `numSlices` disjoint
  * time slices, each an `InputPartition`, so EXECUTORS fetch and
  * paginate concurrently through the same `PosApiClient` the driver
  * path uses. Each output row is one raw page body (string); parsing
  * stays schema-on-read via `Receipts.fromBodies` exactly like the
  * driver path — the source never deserializes receipts.
  *
  * Usage:
  * {{{
  *   spark.read.format("pos-receipts")
  *     .option("baseUrl", …).option("apiKey", …)
  *     .option("updatedAtMin", "2025-07-01T00:00:00Z")
  *     .option("updatedAtMax", "2025-08-01T00:00:00Z")
  *     .option("numSlices", "8")
  *     .load()
  * }}}
  *
  * Slice boundaries are millisecond-aligned: slice i covers
  * `[start + i·step, start + (i+1)·step − 1ms]` (final slice ends at
  * `updatedAtMax`), matching the API's inclusive-bounds contract so a
  * receipt lands in exactly one slice. Millisecond precision matters:
  * the reference API emits `updated_at` at ms precision
  * (`reference/etl/extract.py` isoformat(timespec="milliseconds")), so
  * second-aligned slices would leave a 1-second gap between adjacent
  * slices into which a receipt at e.g. `T00:00:00.500Z` silently
  * disappears. Politeness: the per-page delay
  * applies per slice; `numSlices` multiplies concurrent load on the
  * upstream, so size it against the API's rate limit, not the cluster.
  * The debug `receiptCap` is deliberately driver-path-only.
  */
class RestReceiptsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "pos-receipts"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestReceiptsSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new RestReceiptsTable(new CaseInsensitiveStringMap(properties))
}

object RestReceiptsSource {
  val schema: StructType = StructType(Seq(
    StructField("slice_start", StringType),
    StructField("slice_end", StringType),
    StructField("page_index", IntegerType),
    StructField("body", StringType)))
}

private[sources] class RestReceiptsTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"pos-receipts(${options.get("baseUrl")})"
  override def schema(): StructType = RestReceiptsSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(readOptions: CaseInsensitiveStringMap): ScanBuilder = {
    def req(k: String): String = {
      val v = options.getOrDefault(k, readOptions.get(k))
      require(v != null, s"pos-receipts source requires option '$k'")
      v
    }
    new RestScan(
      baseUrl = req("baseUrl"),
      apiKey = req("apiKey"),
      updatedAtMin = req("updatedAtMin"),
      updatedAtMax = req("updatedAtMax"),
      numSlices = options.getOrDefault("numSlices", "4").toInt,
      pageDelayMs = options.getOrDefault("pageDelayMs", "500").toLong)
  }
}

private[sources] class RestScan(
    baseUrl: String,
    apiKey: String,
    updatedAtMin: String,
    updatedAtMax: String,
    numSlices: Int,
    pageDelayMs: Long) extends ScanBuilder with Scan with Batch {

  override def build(): Scan = this
  override def readSchema(): StructType = RestReceiptsSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"pos-receipts [$updatedAtMin, $updatedAtMax] x $numSlices slices"

  override def planInputPartitions(): Array[InputPartition] = {
    val startMs = Instant.parse(updatedAtMin).toEpochMilli
    val endMs = Instant.parse(updatedAtMax).toEpochMilli
    require(endMs >= startMs, s"updatedAtMax $updatedAtMax before updatedAtMin $updatedAtMin")
    RestScan.slices(startMs, endMs, numSlices)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    RestReaderFactory(baseUrl, apiKey, pageDelayMs)

  /** Streaming form (S3's incremental poll as a `readStream` source):
    * offsets are ISO-8601 watermarks over `updated_at`; each micro
    * batch covers `(lastOffset, min(now, updatedAtMax)]`, sliced into
    * `numSlices` executor partitions exactly like the batch path. The
    * checkpoint persists the watermark, so a restarted query resumes
    * where the last committed batch ended — the streaming counterpart
    * of the pipeline's StateStore watermark commit.
    */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new RestMicroBatchStream(baseUrl, apiKey, updatedAtMin, updatedAtMax, numSlices, pageDelayMs)
}

private[sources] object RestScan {
  /** Disjoint millisecond-precision cover of `[startMs, endMs]`:
    * slice i is `[startMs + i·step, startMs + (i+1)·step − 1 ms]`, the
    * final slice absorbs the remainder up to `endMs`. Adjacent slices
    * share no instant and leave no gap, so with the API's inclusive
    * [min, max] contract every ms-precision `updated_at` is fetched by
    * exactly one slice.
    */
  def slices(startMs: Long, endMs: Long, numSlices: Int): Array[InputPartition] = {
    val n = math.max(1L, math.min(numSlices.toLong, math.max(1L, endMs - startMs))).toInt
    val step = math.max(1L, (endMs - startMs) / n)
    def iso(ms: Long): String = Instant.ofEpochMilli(ms).toString
    (0 until n).map { i =>
      val s = startMs + i * step
      val e = if (i == n - 1) endMs else math.min(endMs, s + step - 1)
      RestSlice(iso(s), iso(e)): InputPartition
    }.toArray
  }
}

private[sources] case class RestOffset(iso: String) extends Offset {
  override def json(): String = s"""{"updated_at":"$iso"}"""
}

private[sources] class RestMicroBatchStream(
    baseUrl: String,
    apiKey: String,
    updatedAtMin: String,
    updatedAtMax: String,
    numSlices: Int,
    pageDelayMs: Long) extends MicroBatchStream {

  private val offsetRe = """"updated_at"\s*:\s*"([^"]+)"""".r

  override def initialOffset(): Offset = RestOffset(updatedAtMin)

  /** The API exposes no change feed, so "latest" is the wall clock
    * capped at updatedAtMax — standard for poll-based sources.
    */
  override def latestOffset(): Offset = {
    val now = Instant.now().getEpochSecond
    val cap = Instant.parse(updatedAtMax).getEpochSecond
    RestOffset(Instant.ofEpochSecond(math.min(now, cap)).toString)
  }

  override def deserializeOffset(json: String): Offset =
    offsetRe.findFirstMatchIn(json) match {
      case Some(m) => RestOffset(m.group(1))
      case None => throw new IllegalArgumentException(s"bad pos-receipts offset: $json")
    }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val startMs = Instant.parse(start.asInstanceOf[RestOffset].iso).toEpochMilli
    val endMs = Instant.parse(end.asInstanceOf[RestOffset].iso).toEpochMilli
    if (endMs <= startMs) return Array.empty
    // (start, end]: begin 1 ms after the committed watermark (inclusive
    // API bounds), same disjoint ms-precision slicing as the batch scan
    // — a receipt updated within the watermark's second is still seen.
    RestScan.slices(startMs + 1, endMs, numSlices)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    RestReaderFactory(baseUrl, apiKey, pageDelayMs)

  override def commit(end: Offset): Unit = () // watermark lives in the checkpoint
  override def stop(): Unit = ()
}

private[sources] case class RestSlice(start: String, end: String) extends InputPartition

private[sources] case class RestReaderFactory(
    baseUrl: String, apiKey: String, pageDelayMs: Long) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val slice = partition.asInstanceOf[RestSlice]
    new PartitionReader[InternalRow] {
      // Lazy: the HTTP walk happens on the executor at first next(),
      // not at plan time on the driver.
      private var pages: Iterator[(String, Int)] = _
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (pages == null)
          pages = new PosApiClient(baseUrl, apiKey, pageDelayMs)
            .fetchReceiptPages(slice.start, slice.end).iterator.zipWithIndex
        if (pages.hasNext) {
          val (body, idx) = pages.next()
          current = InternalRow(
            UTF8String.fromString(slice.start), UTF8String.fromString(slice.end),
            idx, UTF8String.fromString(body))
          true
        } else false
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
