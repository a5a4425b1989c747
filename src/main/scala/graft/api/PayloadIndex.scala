package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Payload secondary indexing — the Qdrant `create_payload_index` /
  * Milvus scalar-index / ES doc-values role, re-expressed as LAYOUT:
  * in a scan engine the index that survives 100 TB is not a B-tree,
  * it is a file organization under which a selective payload
  * predicate skips FILES (listing-level for partition columns,
  * footer min/max for clustered columns) instead of decoding and
  * discarding rows.
  *
  * A layout declares, per filterable field, how it is materialized:
  *  - KEYWORD fields (low-cardinality tags: lang, source, tenant,
  *    label) become PARTITION columns — equality/IN prune whole
  *    directories at the file listing, before any I/O;
  *  - NUMERIC fields become the range-clustering key — files cover
  *    disjoint value ranges (within each keyword partition), so a
  *    range predicate touches only files whose min/max footer stats
  *    intersect it.
  *
  * [[plan]] is the query-side half (the strategy switch Qdrant's
  * filtered-search planner performs): it classifies each condition of
  * a [[FilterDsl.Filter]] against the declared layout, so callers —
  * and the spec — can see which predicates prune files and which
  * merely filter rows. The scan itself needs no custom reader:
  * `FilterDsl.toColumn` predicates reach Catalyst, which performs the
  * partition pruning and parquet pushdown the layout was written for.
  */
object PayloadIndex {

  /** Per-field layout declaration. A GEO field `k` (Qdrant geo
    * payload index / ES `geo_point`) is stored as the column pair
    * `k_lat`/`k_lon` and becomes the SPACE-FILLING clustering key:
    * files are range-clustered on the Morton interleave of the
    * bucketed coordinates ([[ScaleOps.zValue]]), so each file covers
    * a small rectangle of the globe and a radius/polygon/box query
    * skips every file whose lat/lon footer min/max miss its
    * bounding box. At most one geo field clusters a layout (a
    * 2-D curve is already the clustering budget); geo and numeric
    * clustering are mutually exclusive for the same reason.
    */
  final case class Layout(keyword: Seq[String] = Nil,
                          numeric: Seq[String] = Nil,
                          geo: Option[String] = None,
                          geoShape: Option[String] = None) {
    require(Seq(geo.nonEmpty, geoShape.nonEmpty, numeric.nonEmpty).count(identity) <= 1,
      "a layout clusters by EITHER its numeric fields, its geo field, or its geo-shape field")
  }

  /** Geo bucketing resolution: 2^GeoBits buckets per axis (~0.003°
    * of latitude per bucket — far finer than any file's extent).
    */
  private val GeoBits = 16

  /** Write `df` under the declared layout: keyword fields partition
    * the directory tree; numeric fields (or the geo field's Morton
    * key) range-cluster the files inside each partition (`numFiles`
    * range buckets, sorted within, so footer min/max are tight and
    * disjoint). One range shuffle — the same cost class as any
    * clustered write.
    */
  def write(df: DataFrame, path: String, layout: Layout, numFiles: Int = 8): Unit = {
    // bucket a (lat, lon) column pair into [0, 2^GeoBits) per axis —
    // zValue's contract — and interleave; the z column is dropped
    // before the write, so the layout is pure file ORDER, not schema
    def withMorton(d: DataFrame, latC: org.apache.spark.sql.Column,
                   lonC: org.apache.spark.sql.Column): DataFrame = {
      val scale = (1 << GeoBits) - 1
      d.withColumn("__gx", greatest(lit(0L), least(lit(scale.toLong),
          floor((latC + 90.0) / 180.0 * (scale + 1)).cast("long"))))
        .withColumn("__gy", greatest(lit(0L), least(lit(scale.toLong),
          floor((lonC + 180.0) / 360.0 * (scale + 1)).cast("long"))))
        .withColumn("__z", ScaleOps.zValue("__gx", "__gy", GeoBits))
        .drop("__gx", "__gy")
    }
    val (toWrite, clusterCols) = (layout.geo, layout.geoShape) match {
      case (Some(g), _) =>
        (withMorton(df, col(s"${g}_lat"), col(s"${g}_lon")), Seq(col("__z")))
      case (None, Some(g)) =>
        // shapes cluster by their bbox CENTER: constant-extent-class
        // shapes land in files covering small rectangles, and the
        // bbox columns' footer min/max stay tight per file — which is
        // what a GeoShapeIntersects bbox-overlap predicate skips on
        (withMorton(df, (col(s"${g}_latmin") + col(s"${g}_latmax")) / 2.0,
          (col(s"${g}_lonmin") + col(s"${g}_lonmax")) / 2.0), Seq(col("__z")))
      case (None, None) =>
        (df, (layout.keyword ++ layout.numeric).map(col))
    }
    val clustered =
      if (clusterCols.isEmpty) toWrite
      else toWrite.repartitionByRange(numFiles, clusterCols: _*)
        .sortWithinPartitions(clusterCols: _*)
    val w = clustered.drop("__z").write.mode("overwrite")
    (if (layout.keyword.nonEmpty) w.partitionBy(layout.keyword: _*) else w)
      .parquet(path)
  }

  /** How each top-level condition of `filter` is served by `layout`:
    * `partition_pruned` (keyword equality/IN — directories skipped at
    * the listing), `file_stats_skipped` (numeric range/equality on
    * the clustering key — files skipped on footer min/max), or
    * `row_filtered` (no index help; still pushed down, but every file
    * is opened). `should`/`mustNot` clauses never prune files (they
    * are not conjunctive), so they classify as `row_filtered`.
    */
  def plan(filter: FilterDsl.Filter, layout: Layout): Seq[(String, String)] = {
    def classify(c: FilterDsl.Condition): (String, String) = c match {
      case FilterDsl.MatchValue(k, _) if layout.keyword.contains(k) => k -> "partition_pruned"
      case FilterDsl.MatchAny(k, _) if layout.keyword.contains(k) => k -> "partition_pruned"
      case FilterDsl.MatchValue(k, _) if layout.numeric.contains(k) => k -> "file_stats_skipped"
      case FilterDsl.Range(k, _, _, _, _) if layout.numeric.contains(k) => k -> "file_stats_skipped"
      // a geo condition on the clustered geo field prunes through
      // its implied bounding box: the z-layout's files cover small
      // lat/lon rectangles, and the box's four range predicates
      // reach the footer stats
      case g: FilterDsl.GeoCondition if layout.geo.contains(g.key) =>
        g.key -> "file_stats_skipped"
      // a shape-intersection on the clustered shape field prunes
      // through its bbox-OVERLAP ranges against the stored bbox
      // columns' footer stats
      case s: FilterDsl.GeoShapeIntersects if layout.geoShape.contains(s.key) =>
        s.key -> "file_stats_skipped"
      case other => fieldOf(other) -> "row_filtered"
    }
    def fieldOf(c: FilterDsl.Condition): String = c match {
      case FilterDsl.MatchValue(k, _) => k
      case FilterDsl.MatchAny(k, _) => k
      case FilterDsl.MatchExcept(k, _) => k
      case FilterDsl.Range(k, _, _, _, _) => k
      case FilterDsl.TextContains(k, _) => k
      case FilterDsl.IsNull(k) => k
      case g: FilterDsl.GeoCondition => g.key
      case s: FilterDsl.GeoShapeIntersects => s.key
      case FilterDsl.Nested(_) => "(nested)"
    }
    filter.must.map(classify) ++
      (filter.should ++ filter.mustNot).map(c => fieldOf(c) -> "row_filtered")
  }

  /** Scan the layout under a structured filter: one parquet read,
    * predicates compiled by [[FilterDsl]] — pruning follows from the
    * layout, not from custom read logic.
    */
  def scan(spark: SparkSession, path: String, filter: FilterDsl.Filter): DataFrame =
    spark.read.parquet(path).filter(filter.toColumn)
}
