package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental ANN index maintenance — the vector-side analog of
  * [[graft.dedup.Dedup.incrementalDedup]], and the production update
  * path every vector-serving stack needs: new embeddings arrive (a
  * shard, or a streaming micro-batch), are assigned to EXISTING IVF
  * cells and encoded against the FROZEN PQ codebook, and appended to
  * the cells/codes tables. Searches immediately see old+new vectors;
  * nothing retrains (FAISS's `add` vs `train` split).
  *
  * Scale shape: an append touches only the arriving rows — cell
  * assignment is a map over the shard against kCells broadcast
  * centroids, encoding is the shard ⋈ broadcast m·k-row codebook plus
  * one shard-local window — zero aggregates, zero base-corpus reads
  * (IncrementalIndexSpec asserts the EXECUTED append plan has no
  * Aggregate node: Lloyd retraining cannot hide in it). Periodic full
  * retrains (codebook drift after the corpus doubles, say) rebuild via
  * [[build]] offline, exactly like a production IVF-PQ deployment.
  */
object IncrementalIndex {

  /** A frozen index: trained artifacts (codebook + centroids) plus the
    * append-only searchable state (codes + cell assignments). */
  final case class Index(cb: DataFrame, cents: Array[Array[Float]],
                         codes: DataFrame, cells: DataFrame)

  /** Train on the base corpus and index it. The codebook is
    * materialized ([[org.apache.spark.sql.Dataset.localCheckpoint]]) —
    * it IS the stored artifact; every later append re-reads it rather
    * than re-deriving the Lloyd chain. */
  def build(base: DataFrame, kCells: Int = 16, m: Int = Pq.defaultM,
            k: Int = 16, iters: Int = 2): Index = {
    val cb = Pq.codebooks(base, m, k, iters).localCheckpoint()
    val cents = IvfKnn.centroids(base, kCells)
    Index(cb, cents,
      Pq.encodeWithWindow(base, cb, m),
      IvfKnn.assign(base, cents).select(col("vec_id"), col("cell")))
  }

  /** Append a shard of new vectors against the frozen artifacts:
    * assign to existing cells, encode against the existing codebook,
    * union into the searchable state. No retraining by construction —
    * the returned index holds the SAME cb/cents objects. */
  def append(idx: Index, shard: DataFrame, m: Int = Pq.defaultM): Index =
    idx.copy(
      codes = idx.codes.unionAll(Pq.encodeWithWindow(shard, idx.cb, m)),
      cells = idx.cells.unionAll(
        IvfKnn.assign(shard, idx.cents).select(col("vec_id"), col("cell"))))

  /** [[append]] under at-least-once delivery: a replayed micro-batch
    * must not land twice (duplicate code rows double-count a vector in
    * every search). Already-indexed ids are anti-joined out against
    * the CELLS table — vec_id-count-sized, the small side of the index
    * state — before the shard encodes, so a full replay is a no-op
    * that never reaches the encoder. The streaming-consume twin of
    * [[graft.streaming.Idempotence.dedupOnRead]], for index state. */
  def appendIdempotent(idx: Index, shard: DataFrame,
                       m: Int = Pq.defaultM): Index =
    append(idx,
      shard.join(idx.cells.select(col("vec_id")), Seq("vec_id"), "left_anti"),
      m)

  /** IVF probe → PQ shortlist → exact re-rank over the index's current
    * state (old + appended shards). `embs` supplies the query vectors
    * and the re-rank's raw vectors (at scale: point lookups of
    * topK·refine rows per query). */
  def search(embs: DataFrame, idx: Index, queryMaxId: Long = 10,
             topK: Int = 5, nprobe: Int = 4, m: Int = Pq.defaultM,
             refine: Int = 8): DataFrame =
    Pq.ivfPqPlan(embs, idx.cb, idx.codes, idx.cents, idx.cells,
      queryMaxId, topK, nprobe, m, refine, adc = false)

  /** The oracle-checked end-to-end shape (q_incr_index): vectors below
    * `splitId` are the originally-indexed base, the rest arrive as a
    * shard and are appended against the frozen artifacts; the search
    * then sees the full corpus. Training reads ONLY the base — the
    * DuckDB twin trains its codebook/centroid CTEs on `vec_id <
    * splitId` and encodes/assigns everything. */
  def incrIndexKnn(embs: DataFrame, splitId: Long = 400,
                   queryMaxId: Long = 10, topK: Int = 5,
                   kCells: Int = 16, nprobe: Int = 4,
                   m: Int = Pq.defaultM, k: Int = 16, iters: Int = 2,
                   refine: Int = 8): DataFrame = {
    val idx = build(embs.filter(col("vec_id") < splitId), kCells, m, k, iters)
    val grown = append(idx, embs.filter(col("vec_id") >= splitId), m)
    search(embs, grown, queryMaxId, topK, nprobe, m, refine)
  }
}
