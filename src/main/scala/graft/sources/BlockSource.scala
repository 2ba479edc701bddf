package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Incremental block-scan source — SURVEY.md §2.1 S1/S3 as a REAL
  * DataSource V2 connector (`format("graft-blocks")`): the reference's
  * cursor-driven chain poll (`indexer/scan_raw_txs.py:74-141` — resume at
  * last_raw_tx_block+1, cap at head − blocks_recession, paced batches)
  * becomes a `MicroBatchStream` whose offsets ARE block cursors, so the
  * Structured Streaming checkpoint subsumes the reference's `moc_indexer`
  * cursor document, and a batch `Scan` of the same table serves the
  * forced-range backfill mode.
  *
  * Block content is a deterministic simulation (this environment has no
  * chain node): blockNumber, a 30 s-spaced timestamp, a hash-derived tx
  * count and parent hash. A production profile swaps the row generator
  * for an RPC/file reader behind the same partition interface.
  *
  * Scale: each micro-batch's block range splits into `slices` input
  * partitions → executors generate/fetch disjoint sub-ranges in parallel;
  * pacing via `blocksPerTrigger` bounds micro-batch size (the
  * maxOffsetsPerTrigger analog).
  *
  * Options: headBlock (chain head), recession (reorg margin, default 2),
  * blocksPerTrigger (pacing, default 1000), slices (read parallelism,
  * default 4), startBlock (default 0).
  */
class BlockSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-blocks"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BlockSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BlockTable(new CaseInsensitiveStringMap(properties))
}

object BlockSource {
  val Schema: StructType = StructType(Seq(
    StructField("blockNumber", LongType, nullable = false),
    StructField("blockTs", TimestampType, nullable = false),
    StructField("txCount", IntegerType, nullable = false),
    StructField("parentHash", StringType, nullable = false)))

  /** genesis epoch (2024-01-01T00:00:00Z) in micros; 30 s block time. */
  val GenesisMicros: Long = 1704067200L * 1000000L
  val BlockMicros: Long = 30L * 1000000L

  def row(block: Long): InternalRow = {
    val mixed = block * 0x9e3779b97f4a7c15L
    new GenericInternalRow(Array[Any](
      block,
      GenesisMicros + block * BlockMicros,
      ((mixed >>> 33) % 50).toInt,
      UTF8String.fromString(f"0x${mixed}%016x")))
  }
}

final case class BlockOffset(lastBlock: Long) extends Offset {
  override def json(): String = lastBlock.toString
}

final case class BlockRangePartition(fromInclusive: Long, toInclusive: Long)
  extends InputPartition

class BlockTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val head = options.getLong("headBlock", 1000L)
  private val recession = options.getLong("recession", 2L)
  private val perTrigger = options.getLong("blocksPerTrigger", 1000L)
  private val slices = options.getLong("slices", 4L).toInt
  private val startBlock = options.getLong("startBlock", 0L)

  override def name(): String = s"graft_blocks(head=$head)"
  override def schema(): StructType = BlockSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      private val safeHead = head - recession
      override def readSchema(): StructType = BlockSource.Schema

      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] =
          BlockPartitioner.split(startBlock, safeHead, slices)
        override def createReaderFactory(): PartitionReaderFactory =
          BlockReaderFactory
      }

      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new MicroBatchStream {
          // cursor = last block whose batch was planned; pacing happens in
          // latestOffset (the engine commits exactly what it returns, so
          // capping anywhere else would silently drop blocks).
          @volatile private var cursor = startBlock - 1
          override def initialOffset(): Offset = {
            cursor = startBlock - 1
            BlockOffset(cursor)
          }
          // at most blocksPerTrigger new blocks per micro-batch, never
          // past head − recession (reorg margin, T2)
          override def latestOffset(): Offset = {
            val next = math.min(safeHead, cursor + perTrigger)
            cursor = math.max(cursor, next)
            BlockOffset(next)
          }
          override def deserializeOffset(json: String): Offset = {
            val o = BlockOffset(json.trim.toLong)
            cursor = math.max(cursor, o.lastBlock)
            o
          }
          override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
            BlockPartitioner.split(
              start.asInstanceOf[BlockOffset].lastBlock + 1,
              end.asInstanceOf[BlockOffset].lastBlock, slices)
          override def createReaderFactory(): PartitionReaderFactory =
            BlockReaderFactory
          override def commit(end: Offset): Unit = ()
          override def stop(): Unit = ()
        }
    }
}

object BlockPartitioner {
  def split(fromInclusive: Long, toInclusive: Long, slices: Int): Array[InputPartition] = {
    if (toInclusive < fromInclusive) return Array.empty
    val n = toInclusive - fromInclusive + 1
    val k = math.min(slices.toLong, n).toInt
    (0 until k).map { i =>
      val lo = fromInclusive + n * i / k
      val hi = fromInclusive + n * (i + 1) / k - 1
      BlockRangePartition(lo, hi): InputPartition
    }.toArray
  }
}

object BlockReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[BlockRangePartition]
    new PartitionReader[InternalRow] {
      private var cur = p.fromInclusive - 1
      override def next(): Boolean = { cur += 1; cur <= p.toInclusive }
      override def get(): InternalRow = BlockSource.row(cur)
      override def close(): Unit = ()
    }
  }
}
