package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * As-of join: attach to each probe row the most recent reference row at
 * or before its event time, per key — the canonical time-series join
 * Spark has no built-in for (DuckDB: `ASOF JOIN`; pandas: `merge_asof`;
 * kdb: `aj`). Left semantics: probes with no earlier reference keep
 * nulls.
 *
 * Implementation is a UNION + running `last(ignoreNulls)` window, not a
 * range join: both sides shuffle ONCE on the key, rows sort by (time,
 * side) with references before probes at equal timestamps (at-or-before
 * semantics), and the carried reference struct reaches every probe in a
 * single sorted pass per key. No per-probe backward scan, no range-join
 * row explosion — the work is one sort-based window per key partition,
 * which is exactly what scales on a cluster (a billion probes against a
 * billion references is still one co-partitioned sort).
 *
 * INPUT CONTRACT: reference rows must be unique per (key, time) — the
 * at-or-before row would otherwise be ambiguous. Pre-aggregate
 * duplicates (e.g. `max_by`) before calling; q49's oracle does the same
 * so DuckDB's native ASOF picks the identical row.
 */
object AsofJoin {

  /**
   * @param probes  left side; ALL its columns pass through
   * @param refs    reference side: `keyCol`, `timeCol`, `refCols`
   * @param refCols reference payload columns to attach
   * @return probes' columns ++ (`ref_<timeCol>`, `ref_<c>` for refCols),
   *         null-filled where the probe precedes every reference
   */
  def asofJoin(
      probes: DataFrame,
      refs: DataFrame,
      keyCol: String,
      timeCol: String,
      refCols: Seq[String],
      refPrefix: String = "ref_"): DataFrame = {
    // output-name collisions would surface as AMBIGUOUS_REFERENCE far
    // from this call site — reject them here instead
    require(!refCols.contains(timeCol),
      s"refCols must not include timeCol '$timeCol' — it is attached automatically as $refPrefix$timeCol")
    val outRefNames = (timeCol +: refCols).map(refPrefix + _)
    // Spark resolves names case-insensitively by default, so the clash
    // check must too
    val clash = (probes.columns.toSeq ++ outRefNames)
      .groupBy(_.toLowerCase).collect { case (c, xs) if xs.size > 1 => c }
    require(clash.isEmpty,
      s"asofJoin output would contain duplicate column(s) ${clash.mkString(", ")} — rename probe columns or pass a different refPrefix")
    val probeStructType = StructType(probes.schema.fields)
    val refStructFields = (col(timeCol).as("__t") +: refCols.map(c => col(c).as(c)))
    val refStructType = StructType(
      refs.select(refStructFields: _*).schema.fields.map(f => f.copy(nullable = true)))

    val taggedProbes = probes.select(
      col(keyCol).as("__k"), col(timeCol).as("__time"), lit(1).as("__probe"),
      struct(probes.columns.map(col): _*).as("__p"),
      lit(null).cast(refStructType).as("__r"))
    val taggedRefs = refs.select(
      col(keyCol).as("__k"), col(timeCol).as("__time"), lit(0).as("__probe"),
      lit(null).cast(probeStructType).as("__p"),
      struct(refStructFields: _*).as("__r"))

    // refs (0) sort before probes (1) at equal time: "at or before"
    val w = Window.partitionBy("__k").orderBy(col("__time"), col("__probe"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedProbes.unionByName(taggedRefs)
      .withColumn("__asof", last("__r", ignoreNulls = true).over(w))
      .where(col("__probe") === 1)
      .select(
        probes.columns.map(c => col(s"__p.`$c`").as(c)) ++
          (col(s"__asof.__t").as(refPrefix + timeCol) +:
            refCols.map(c => col(s"__asof.`$c`").as(refPrefix + c))): _*)
  }
}
