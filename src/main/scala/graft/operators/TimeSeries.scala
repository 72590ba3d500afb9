package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal-behavior similarity search: which users have the most
  * similar activity RHYTHM to a set of query users — the time-series
  * twin of the embedding KNN family (distributed top-k series
  * similarity à la EDBT'19 "Time Series Similarity Search for Streaming
  * Data", re-expressed as declarative Spark).
  *
  * Each user becomes a fixed-width integer activity profile (events per
  * UTC hour-of-day, 24 buckets — a dense grid, so missing hours are
  * explicit zeros and every vector is comparable); similarity is cosine
  * over those count vectors. Counts are integers, the dot products are
  * exact in double, and ordering ties break on user_id — the same
  * engine-parity recipe as the embedding KNN oracles.
  *
  * Scale shape: the profile build is one partial-aggregated
  * groupBy(user) over conditional sums (no pivot shuffle, no map
  * building); query profiles broadcast; the corpus side streams through
  * the scoring join map-side and per-query top-k goes through the
  * WindowGroupLimit partial rank. 100 TB of events reduce to one
  * profile row per user before anything pairwise happens. */
object TimeSeries {

  private val nBuckets = 24

  /** Per-user 24-hour activity profile as an array column. Conditional
    * sums, not a pivot: the aggregate emits the dense vector directly
    * and partial-aggregates map-side. The hour comes from epoch
    * arithmetic (ms div 3600000 mod 24), not a timestamp function, so
    * no engine's timezone/calendar logic can enter the comparison. */
  def activityProfiles(events: DataFrame): DataFrame = {
    val hourOfDay = expr("(unix_millis(ts) div 3600000) % 24")
    events.groupBy(col("user_id"))
      .agg(array((0 until nBuckets).map(h =>
        sum(when(hourOfDay === h, 1L).otherwise(0L))): _*).as("vec"),
        count(lit(1)).as("n_events"))
  }

  /** Top-k most rhythm-similar users for each query user
    * (user_id < queryMaxUser). Self-matches excluded. */
  def similarActivity(events: DataFrame, queryMaxUser: Long = 10,
                      k: Int = 5): DataFrame = {
    val prof = activityProfiles(events)
      .select(col("user_id"), col("vec"),
        sqrt(aggregate(col("vec"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double"))).as("nrm"))
    val queries = prof.filter(col("user_id") < queryMaxUser)
      .select(col("user_id").as("query_user"), col("vec").as("q_vec"),
        col("nrm").as("q_nrm"))
    val dot = aggregate(zip_with(col("q_vec"), col("vec"),
      (a, b) => a.cast("double") * b.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val w = Window.partitionBy(col("query_user"))
      .orderBy(col("cos_sim").desc, col("user_id"))
    broadcast(queries)
      .join(prof, col("user_id") =!= col("query_user"))
      .select(col("query_user"), col("user_id"),
        round(dot / (col("q_nrm") * col("nrm")), 4).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** DuckDB oracle: identical integer profiles (conditional sums over
    * the same UTC hour grid) and the same rounded-cosine ranking. */
  def similarActivitySql(queryMaxUser: Long = 10, k: Int = 5): String = {
    // CAST: DuckDB sum() yields HUGEINT; the vector must be BIGINT for
    // list_dot_product parity with Spark's long array
    val vec = (0 until nBuckets)
      .map(h => s"CAST(sum(CASE WHEN (epoch_ms(ts) // 3600000) % 24 = $h THEN 1 ELSE 0 END) AS BIGINT)")
      .mkString("[", ", ", "]")
    s"""WITH prof AS (
       |  SELECT user_id, $vec AS vec, count(*) AS n_events
       |  FROM events GROUP BY 1),
       |nrm AS (
       |  SELECT user_id, vec,
       |         sqrt(list_dot_product(vec, vec)) AS nrm
       |  FROM prof),
       |scored AS (
       |  SELECT q.user_id AS query_user, c.user_id,
       |         round(list_dot_product(q.vec, c.vec) / (q.nrm * c.nrm), 4) AS cos_sim
       |  FROM nrm q JOIN nrm c ON c.user_id <> q.user_id
       |  WHERE q.user_id < $queryMaxUser),
       |ranked AS (
       |  SELECT query_user, user_id, cos_sim,
       |         row_number() OVER (PARTITION BY query_user
       |                            ORDER BY cos_sim DESC, user_id) AS rank
       |  FROM scored)
       |SELECT query_user, user_id, cos_sim, CAST(rank AS INT) AS rank
       |FROM ranked WHERE rank <= $k""".stripMargin
  }
}
