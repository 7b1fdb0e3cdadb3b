package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combining a keyword ranking
  * with one or more vector rankings is how a modern curation stack
  * picks training examples (neither lexical nor semantic recall alone
  * suffices). Fusion works on RANKS, not scores, so heterogeneous
  * retrievers (BM25-ish counts, cosines, PageRank) compose without
  * calibration.
  */
object Retrieval {

  /** Reciprocal-rank fusion over N ranked candidate lists: score(id)
    * = Σ over lists of 1e6 div (k0 + rank), in integer micro-units —
    * exact, commutative, engine-reproducible (a double 1/(k+r) sum
    * would tie-break on ulps). Each input carries (idCol, rankCol)
    * with rank 1-based.
    *
    * Scale shape: each list should arrive as its retriever's bounded
    * top-k (a TakeOrderedAndProject, not a global window over the
    * corpus), so the fuse is a union of k-row frames plus one groupBy
    * on id — the whole fusion is index-output-sized, independent of
    * corpus size. Ids absent from a list simply contribute nothing
    * (standard RRF); `n_lists` reports how many lists surfaced each
    * id. */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, rankCol: String,
      k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    lists.map(_.select(col(idCol),
        expr(s"1000000L div ($k0 + $rankCol)").as("part")))
      .reduce(_ unionByName _)
      .groupBy(idCol)
      .agg(sum("part").as("rrf_micro"), count(lit(1)).as("n_lists"))
  }
}
