package graft.cdc

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Dense per-group sequence numbers at scale — Kafka-style offsets
  * (1, 2, 3, … within each group, ordered by `orderCol`) without the
  * low-cardinality-window trap.
  *
  * `row_number().over(partitionBy(group).orderBy(order))` puts EVERY
  * row of a group into one task: a 4-partition topic numbers 100 TB
  * through 4 single-task sorts. This utility gets the identical
  * numbering from a range shuffle at full cluster width:
  *
  *  1. range-repartition + sort by (group…, order) — rows of a group
  *     span a CONTIGUOUS run of partitions, globally sorted;
  *  2. count rows per (partition, group) — one small pass,
  *     O(partitions × groups-per-partition) rows to the driver;
  *  3. prefix-sum those counts in partition order → each partition's
  *     starting offset per group, broadcast back;
  *  4. second pass assigns base + local running index.
  *
  * The shuffle map stage is computed once and reused by both passes
  * (same RDD lineage), so the extra cost over a plain sort is one
  * reduce-side re-sort — at full parallelism, vs the window's
  * one-task-per-group serialization.
  *
  * Intended for LOW-cardinality groups (topic partitions, shards,
  * files): the driver sees O(partitions × group cardinality) count
  * rows. For high-cardinality groups the plain window is already
  * parallel — use that. `orderCol` must be unique within a group for
  * a deterministic numbering (same contract as the window twin).
  * Group columns must be scalar (their values become driver map keys).
  */
object Offsets {

  def densePerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      outCol: String,
      numPartitions: Option[Int] = None): DataFrame = {
    require(!df.columns.contains(outCol),
      s"output column '$outCol' already exists in the input")
    val spark = df.sparkSession
    val n = numPartitions.getOrElse(
      spark.sessionState.conf.numShufflePartitions)
    val exprs = (groupCols :+ orderCol).map(col)
    val sorted = df.repartitionByRange(n, exprs: _*)
      .sortWithinPartitions(exprs: _*)
    // ONE rdd instance: both jobs share the lineage, so the range
    // shuffle's map stage runs once and is skipped on the second pass
    val rdd = sorted.rdd
    val gIdx = sorted.columns.toSeq.zipWithIndex.toMap
    val gPos = groupCols.map(gIdx)
    val counts = rdd.mapPartitionsWithIndex { (i, it) =>
      val m = mutable.LinkedHashMap.empty[Seq[Any], Long]
      it.foreach { r =>
        val k = gPos.map(r.get)
        m.update(k, m.getOrElse(k, 0L) + 1L)
      }
      Iterator.single(i -> m.toVector)
    }.collect()
    val running = mutable.Map.empty[Seq[Any], Long]
    val baseByPart: Map[Int, Map[Seq[Any], Long]] =
      counts.sortBy(_._1).map { case (i, groupCounts) =>
        val base = groupCounts.map { case (k, _) =>
          k -> running.getOrElse(k, 0L)
        }.toMap
        groupCounts.foreach { case (k, c) =>
          running.update(k, running.getOrElse(k, 0L) + c)
        }
        i -> base
      }.toMap
    val bc = spark.sparkContext.broadcast(baseByPart)
    val outRdd = rdd.mapPartitionsWithIndex { (i, it) =>
      val seen = mutable.Map.empty[Seq[Any], Long] ++
        bc.value.getOrElse(i, Map.empty)
      it.map { r =>
        val k = gPos.map(r.get)
        val next = seen.getOrElse(k, 0L) + 1L
        seen.update(k, next)
        Row.fromSeq(r.toSeq :+ next)
      }
    }
    spark.createDataFrame(outRdd, sorted.schema.add(outCol, LongType, nullable = false))
  }
}
