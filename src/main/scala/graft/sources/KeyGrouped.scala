package graft.sources

import java.util

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportPartitioning, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThanOrEqual, In, LessThan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Storage-partitioned join demo source (SURVEY.md §4.1, last row): a DSv2
  * table that reports its physical layout — rows pre-grouped by a key — as
  * `KeyGroupedPartitioning`, so an equi-join of two co-partitioned tables on
  * that key elides BOTH shuffles (a "storage-partitioned join").
  *
  * This is the truest Spark-native analog of the reference demo's headline:
  * the token-aware connector + node labels arrange that Spark reads each
  * Cassandra token range from the replica that owns it, so no data moves
  * between nodes (reference: README.md:135, userdata/cloudinit.sh:124-137).
  * Here the "token ring" is the key→partition assignment the source reports,
  * and "no data moves" is the Exchange-free join plan (asserted in PlanSpec).
  * The bucketed-table analog (q_bucketed_join) shows the same effect via
  * catalog metadata; this one shows it the way a real connector does — from
  * the source's own partition report, with each split carrying its partition
  * key (`HasPartitionKey`).
  *
  * Scale: this is precisely the mechanism that removes the two biggest
  * shuffles of a key-to-key join at 100 TB — data is joined where it lies,
  * per partition. Requires `spark.sql.sources.v2.bucketing.enabled` (set by
  * the staging helper); partition-value mismatches between the sides are
  * handled by Spark's partition push-down (missing keys on one side become
  * empty partitions rather than a fallback shuffle).
  *
  * The in-driver registry below stands in for the external storage system a
  * real connector would read (the demo's Cassandra cluster); the operator
  * under test is the scan/join, not the staging.
  */
object KeyGroupedRegistry {
  /** One staged table: schema, the partition-key column (must be LongType),
    * the rows grouped by key — one entry per distinct key = one input
    * split — and an optional clustering column (also LongType). With a
    * clustering column the table models Cassandra's `(pk, ck)` primary key:
    * rows are kept ck-sorted inside each partition, range predicates on ck
    * read one partition's contiguous slice, and the upsert identity is the
    * full `(pk, ck)` pair instead of pk alone. */
  final case class Entry(schema: StructType, keyCol: String,
      parts: Array[(Long, Array[Array[Any]])],
      clusteringCol: Option[String] = None)

  private val tables = TrieMap.empty[String, Entry]
  def put(name: String, e: Entry): Unit = tables.put(name, e)
  def get(name: String): Entry = tables.getOrElse(name,
    throw new IllegalArgumentException(s"graft-kv table not staged: $name"))
  def contains(name: String): Boolean = tables.contains(name)

  /** Observability for tests: splits actually planned by the last scan of
    * each table — how PlanSpec proves key-predicate partition pruning. */
  val lastPlanned = TrieMap.empty[String, Int]

  /** Observability for tests: the replica hosts each key of the last batch
    * write was routed to — how UpsertSpec proves writes land on
    * `KVRing.replicasOf(key)` (the token-aware write path). */
  val lastWritePlacement = TrieMap.empty[String, Map[Long, Seq[String]]]

  /** Collect a (small) DataFrame into the registry grouped by `keyCol`.
    * Driver-side by design: the registry emulates the external cluster that
    * owns the data; at real scale rows never pass through the driver. */
  def stage(name: String, df: DataFrame, keyCol: String,
      clusteringCol: Option[String] = None): Unit = {
    if (contains(name)) return
    val schema = df.schema
    val ki = schema.fieldIndex(keyCol)
    val ci = clusteringCol.map(schema.fieldIndex)
    val grouped = df.collect()
      .map(r => r.toSeq.toArray)
      .groupBy(a => a(ki).asInstanceOf[Long])
      .toArray.sortBy(_._1)
      .map { case (k, rows) =>
        k -> ci.map(c => rows.sortBy(_(c).asInstanceOf[Long])).getOrElse(rows)
      }
    put(name, Entry(schema, keyCol, grouped, clusteringCol))
  }

  /** INSERT-as-upsert commit (CQL write semantics, SURVEY §2.2 write row):
    * each incoming row replaces the row with the same primary key — the
    * whole partition for a single-column key, the matching `(pk, ck)` row
    * when a clustering column is declared — and new keys append. Partitions
    * stay ck-sorted so range slicing remains valid after a write. */
  def applyUpsert(name: String, rows: Array[(Long, Array[Any])]): Unit = synchronized {
    val e = get(name)
    val ci = e.clusteringCol.map(e.schema.fieldIndex)
    val byPk = scala.collection.mutable.LinkedHashMap(
      e.parts.map { case (k, rs) => k -> rs.toBuffer }.toIndexedSeq: _*)
    rows.foreach { case (pk, row) =>
      val buf = byPk.getOrElseUpdate(pk, scala.collection.mutable.Buffer.empty)
      ci match {
        case Some(c) =>
          val i = buf.indexWhere(_(c) == row(c))
          if (i >= 0) buf(i) = row else buf += row
        case None =>
          buf.clear(); buf += row
      }
    }
    val parts = byPk.toArray.map { case (k, buf) =>
      val arr = buf.toArray
      k -> ci.map(c => arr.sortBy(_(c).asInstanceOf[Long])).getOrElse(arr)
    }.sortBy(_._1)
    put(name, e.copy(parts = parts))
  }
}

/** The registry's "token ring": a fixed set of node names standing in for
  * the reference cluster's labeled Cassandra hosts (the demo pins one
  * Cassandra pod per labeled OKE node — userdata/cloudinit.sh:124-137 — and
  * the token-aware connector reads each token range from the replica owning
  * it, README.md:135). Each key's replica set is its ring position plus the
  * next `ReplicationFactor - 1` successors — Cassandra SimpleStrategy.
  *
  * `KVPartition.preferredLocations()` reports this set, which is the literal
  * Spark mechanism for locality (SURVEY §2.1 P1): the DAGScheduler places
  * each split's task on a reported host when one is available. Inert under
  * `local[32]` (one executor, no host match) but it is exactly what makes
  * reads node-local on a real cluster — and it is observable/testable via
  * `RDD.preferredLocations`. */
object KVRing {
  val hosts: Array[String] = Array("graft-node-0", "graft-node-1", "graft-node-2")
  val ReplicationFactor = 2
  def replicasOf(key: Long): Seq[String] = {
    val n = hosts.length
    val primary = (((key % n) + n) % n).toInt
    Seq.tabulate(ReplicationFactor)(i => hosts((primary + i) % n))
  }
}

/** `spark.read.format("graft.sources.KVDataSource").option("table", name)` */
class KVDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KeyGroupedRegistry.get(options.get("table")).schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val name = properties.get("table")
    new KVTable(name, KeyGroupedRegistry.get(name))
  }
}

class KVTable(tname: String, entry: KeyGroupedRegistry.Entry)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-kv:$tname"
  override def schema(): StructType = entry.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)
  override def partitioning(): Array[Transform] =
    Array(Expressions.identity(entry.keyCol))
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KVScanBuilder(tname, entry)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val in = info.schema().fieldNames.toSeq
    val own = entry.schema.fieldNames.toSeq
    require(in == own,
      s"graft-kv:$tname write schema $in does not match table schema $own")
    new KVWriteBuilder(tname, entry)
  }
}

/** Write path of the source — the `df.write.cassandra` analog (SURVEY §2.2
  * write row; reference capability pin: userdata/cloudinit.sh:461). Three
  * Cassandra-faithful properties, each load-bearing at 100 TB:
  *
  *   - **ring-routed**: `RequiresDistributionAndOrdering` asks Spark to
  *     cluster the incoming rows by partition key before any writer runs, so
  *     each task holds whole key groups and sends each group once to the
  *     replicas that own it (`KVRing.replicasOf`) — the token-aware batching
  *     that keeps a 1000-executor write from spraying every coordinator.
  *   - **upsert-by-primary-key**: INSERT is an upsert (CQL semantics,
  *     reference: userdata/cloudinit.sh:312-314 re-runs INSERTs
  *     idempotently); the identity is pk, or (pk, ck) with a clustering
  *     column. Rows are deduplicated last-write-wins inside each writer
  *     (rows arrive (pk, ck)-sorted per the required ordering), then merged
  *     into the table on commit.
  *   - **observable placement**: each commit message carries the replica set
  *     every key was routed to; UpsertSpec asserts it equals
  *     `KVRing.replicasOf(key)`.
  *
  * The registry merge on `commit()` is driver-side because the registry IS
  * the stand-in for the external cluster; on a real ring each writer task
  * would have already sent its groups to the owning replicas, and commit
  * would only seal the batch. */
class KVWriteBuilder(tname: String, entry: KeyGroupedRegistry.Entry)
    extends WriteBuilder {
  override def build(): Write = new KVWrite(tname, entry)
}

class KVWrite(tname: String, entry: KeyGroupedRegistry.Entry)
    extends Write with RequiresDistributionAndOrdering {
  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(Expressions.identity(entry.keyCol)))
  override def requiredOrdering(): Array[SortOrder] =
    (entry.keyCol +: entry.clusteringCol.toSeq).toArray.map(c =>
      Expressions.sort(Expressions.column(c), SortDirection.ASCENDING))
  override def toBatch: BatchWrite = new KVBatchWrite(tname, entry)
}

case class KVCommitMessage(rows: Array[(Long, Array[Any])],
    placement: Array[(Long, Array[String])]) extends WriterCommitMessage

class KVBatchWrite(tname: String, entry: KeyGroupedRegistry.Entry)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new KVWriterFactory(entry.schema, entry.schema.fieldIndex(entry.keyCol),
      entry.clusteringCol.map(entry.schema.fieldIndex))
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.collect { case m: KVCommitMessage => m }
    KeyGroupedRegistry.applyUpsert(tname, msgs.flatMap(_.rows))
    KeyGroupedRegistry.lastWritePlacement.put(tname,
      msgs.flatMap(_.placement).map { case (k, hs) => k -> hs.toSeq }.toMap)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class KVWriterFactory(schema: StructType, keyIx: Int, ckIx: Option[Int])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KVDataWriter(schema, keyIx, ckIx)
}

class KVDataWriter(schema: StructType, keyIx: Int, ckIx: Option[Int])
    extends DataWriter[InternalRow] {
  // last-write-wins per primary key within the task; the required ordering
  // makes "last" deterministic for a sorted batch, and sequential batches
  // resolve at commit time (later commit overwrites)
  private val buf =
    scala.collection.mutable.LinkedHashMap.empty[(Long, Option[Long]), Array[Any]]

  override def write(r: InternalRow): Unit = {
    require(!r.isNullAt(keyIx), "graft-kv: partition key cannot be null (CQL)")
    val ext = Array.tabulate[Any](schema.length) { i =>
      r.get(i, schema.fields(i).dataType) match {
        case u: UTF8String => u.toString
        case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
        case v => v
      }
    }
    val pk = ext(keyIx).asInstanceOf[Long]
    buf((pk, ckIx.map(c => ext(c).asInstanceOf[Long]))) = ext
  }
  override def commit(): WriterCommitMessage = KVCommitMessage(
    buf.toArray.map { case ((pk, _), row) => pk -> row },
    buf.keys.map(_._1).toSet.toArray.map(k => k -> KVRing.replicasOf(k).toArray))
  override def abort(): Unit = ()
  override def close(): Unit = ()
}

/** Pushdown surface of the source — the three capabilities the pinned
  * connector advertises for reads (SURVEY.md §2.2): key-predicate filters
  * become partition pruning (a `key = k` / `key IN (...)` scan reads ONLY
  * the splits owning those keys — Cassandra's point read by partition key),
  * column pruning drops unrequested columns before rows leave the source,
  * and an ungrouped COUNT(*) is answered from the registry's per-key row
  * counts without materializing a single row — the `cassandraCount` analog
  * at the source level (the connector pushes counts to Cassandra's local
  * count rather than shipping rows). Partial pushdown: each split returns
  * its own count and Spark's final aggregate sums them, the same shape as
  * parquet footer counts — at 100 TB no row bytes cross the wire either
  * way. */
class KVScanBuilder(tname: String, entry: KeyGroupedRegistry.Entry)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {
  private var required: StructType = entry.schema
  private var pushed: Array[Filter] = Array.empty
  private var countPushed = false

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val ck = entry.clusteringCol
    val (sup, unsup) = filters.partition {
      case EqualTo(a, _: Number) => a == entry.keyCol || ck.contains(a)
      case EqualTo(a, _) => a == entry.keyCol
      case In(a, _) => a == entry.keyCol
      // clustering-column range: evaluated exactly by slicing the ck-sorted
      // partition (Cassandra's within-partition range scan)
      case GreaterThanOrEqual(a, _: Number) => ck.contains(a)
      case LessThan(a, _: Number) => ck.contains(a)
      case _ => false
    }
    pushed = sup
    unsup // pushed predicates are evaluated exactly by pruning + slicing
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def pushAggregation(agg: Aggregation): Boolean = {
    // COUNT(*) with no grouping only: counts are per-key metadata in the
    // registry. (Grouped-by-key counts would also be answerable, but the
    // connector analog — cassandraCount — is the table-level count.)
    countPushed = agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions()(0).isInstanceOf[CountStar]
    countPushed
  }

  override def build(): Scan = new KVScan(tname, entry, required, pushed, countPushed)
}

class KVScan(tname: String, entry: KeyGroupedRegistry.Entry,
    required: StructType, pushed: Array[Filter], countPushed: Boolean = false)
    extends Scan with Batch with SupportsReportPartitioning
    with SupportsRuntimeFiltering {
  import org.apache.spark.sql.types.LongType
  override def readSchema(): StructType =
    if (countPushed) new StructType().add("count(*)", LongType, nullable = false)
    else required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-kv:$tname pushed=[${pushed.mkString(",")}]" +
      (if (countPushed) " PushedAggregation: [COUNT(*)]" else "")

  /** Runtime filtering (SupportsRuntimeFiltering): the DYNAMIC form of the
    * point lookup. Where DirectJoinRule plants a static IN for literal key
    * lists, this prunes splits at execution time from keys discovered by a
    * runtime subquery/broadcast (dynamic partition pruning on a DSv2 source)
    * — the connector behavior of routing a join's actual keys to the
    * replicas owning them, without rescanning the rest of the ring. Spark
    * calls `filter` after the dim side is evaluated, then re-plans input
    * partitions. */
  private var runtimeKeys: Option[Set[Long]] = None
  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(entry.keyCol))
  override def filter(filters: Array[Filter]): Unit = {
    val keySets = filters.collect {
      case In(a, vs) if a == entry.keyCol =>
        vs.collect { case n: Number => n.longValue }.toSet
      case EqualTo(a, v: Number) if a == entry.keyCol => Set(v.longValue)
    }
    if (keySets.nonEmpty) runtimeKeys = Some(keySets.reduce(_ intersect _))
  }

  private def keepKey(k: Long): Boolean =
    runtimeKeys.forall(_.contains(k)) && (pushed.isEmpty || pushed.forall {
      case EqualTo(a, v) if a == entry.keyCol =>
        v.asInstanceOf[Number].longValue == k
      case In(a, vs) if a == entry.keyCol =>
        vs.exists(_.asInstanceOf[Number].longValue == k)
      case _ => true // clustering-column predicates slice rows, not splits
    })

  // clustering-column range bounds [ckLo, ckHi) from the pushed predicates;
  // rows are ck-sorted at stage/commit time, so each bound is one binary
  // search and the scan reads a contiguous slice of the owning partition
  private lazy val ckIx: Option[Int] =
    entry.clusteringCol.map(entry.schema.fieldIndex)
  private lazy val ckLo: Option[Long] = {
    val los = pushed.collect {
      case GreaterThanOrEqual(a, v: Number) if entry.clusteringCol.contains(a) =>
        v.longValue
      case EqualTo(a, v: Number) if entry.clusteringCol.contains(a) => v.longValue
    }
    if (los.isEmpty) None else Some(los.max)
  }
  private lazy val ckHi: Option[Long] = {
    val his = pushed.collect {
      case LessThan(a, v: Number) if entry.clusteringCol.contains(a) => v.longValue
      case EqualTo(a, v: Number) if entry.clusteringCol.contains(a) => v.longValue + 1
    }
    if (his.isEmpty) None else Some(his.min)
  }
  private def lowerBound(rows: Array[Array[Any]], ci: Int, target: Long): Int = {
    var lo = 0; var hi = rows.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (rows(mid)(ci).asInstanceOf[Long] < target) lo = mid + 1 else hi = mid
    }
    lo
  }
  private def sliceRows(rows: Array[Array[Any]]): Array[Array[Any]] = ckIx match {
    case Some(ci) if ckLo.nonEmpty || ckHi.nonEmpty =>
      val lb = ckLo.map(lowerBound(rows, ci, _)).getOrElse(0)
      val ub = ckHi.map(lowerBound(rows, ci, _)).getOrElse(rows.length)
      if (lb >= ub) Array.empty else rows.slice(lb, ub)
    case _ => rows
  }

  // partition COUNT is needed by outputPartitioning during planning —
  // computed from keys alone, without projecting any rows
  private lazy val keptKeys: Array[Long] = entry.parts.map(_._1).filter(keepKey)

  override def outputPartitioning(): Partitioning =
    // key-grouped only while the key column survives column pruning —
    // otherwise the grouping is unobservable by the query and unreportable
    if (!countPushed && required.fieldNames.contains(entry.keyCol))
      new KeyGroupedPartitioning(
        Array(Expressions.identity(entry.keyCol)), keptKeys.length)
    else new UnknownPartitioning(keptKeys.length)

  override def planInputPartitions(): Array[InputPartition] = {
    val parts: Array[InputPartition] =
      if (countPushed)
        // one metadata row per split: [row-count]; Spark's final agg sums them
        entry.parts.collect {
          case (k, rows) if keepKey(k) =>
            KVPartition(k,
              Array(Array[Any](sliceRows(rows).length.toLong))): InputPartition
        }
      else {
        val idx = required.fieldNames.map(entry.schema.fieldIndex)
        entry.parts.collect {
          case (k, rows) if keepKey(k) =>
            KVPartition(k, sliceRows(rows).map(r => idx.map(r(_)))): InputPartition
        }
      }
    KeyGroupedRegistry.lastPlanned.put(tname, parts.length)
    parts
  }
  override def createReaderFactory(): PartitionReaderFactory = new KVReaderFactory
}

/** One split = one key's rows; `partitionKey` is what lets Spark line the
  * two sides of the join up split-by-split, and `preferredLocations` is what
  * lets the scheduler run the split on the node that owns the key (the
  * token-aware read — see [[KVRing]]). */
case class KVPartition(key: Long, rows: Array[Array[Any]])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(key)
  override def preferredLocations(): Array[String] = KVRing.replicasOf(key).toArray
}

class KVReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val rows = p.asInstanceOf[KVPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow =
        InternalRow.fromSeq(rows(i).toIndexedSeq.map {
          case s: String => UTF8String.fromString(s)
          case v => v
        })
      override def close(): Unit = ()
    }
  }
}
