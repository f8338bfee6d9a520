package graft.crawl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pluggable score flows — the reference's ScoringFilter extension point
  * (scoring/ScoringFilters.java:41-130: injectedScore,
  * distributeScoreToOutlinks, updateDbScore, generatorSortValue)
  * re-expressed Spark-first: hooks that run inside typed row logic are
  * plain scalar functions; the hook that runs over the WHOLE FRONTIER
  * (updatedb's existing-row score update) is Column-based so the merge
  * plan stays inside WholeStageCodegen whatever the filter does.
  *
  * [[ScoringFilter.Default]] reproduces this fork's exact hardcoded
  * behavior (no OPIC plugin ships in it): inject = meta-or-1.0, outlink
  * contribution = srcScore/n, new row = customScore-or-contribution,
  * existing scores never change. The crawl parity suite pins Default
  * against the simulator; custom filters get the extension point the
  * reference had.
  */
trait ScoringFilter extends Serializable {

  /** Score of a freshly injected seed; `metaScore` is the
    * `nutch.score=F` seed-line metadata when present (reference
    * ScoringFilters.injectedScore / InjectorJob).
    */
  def injectedScore(url: String, metaScore: Option[Float]): Float

  /** Per-outlink score contribution when a fetched page's score
    * distributes to its `outlinkCount` outlinks (reference
    * distributeScoreToOutlinks; contributions fold by MAX across a
    * target's inlinks).
    */
  def outlinkContribution(srcUrl: String, srcScore: Float,
      outlinkCount: Int): Float

  /** Score of a newly discovered row entering the frontier. `contrib` is
    * the folded inlink contribution; `customScore` is the per-site
    * config override (0 = none).
    */
  def newRowScore(url: String, contrib: Float, customScore: Float): Float

  /** Updatedb score update for EXISTING rows, as a Column expression over
    * the merge plan (the Spark-first updateDbScore): `score` is the
    * stored score, `contrib` the batch's folded contribution for the row
    * (NULL when the row was not rediscovered this batch). Default:
    * unchanged.
    */
  def updateExistingScore(score: Column, contrib: Column): Column = score

  /** Whether [[updateExistingScore]] is non-identity — when false (the
    * default) updatedb skips the contribution join entirely, so the
    * default pipeline plan carries zero cost for the extension point.
    */
  def updatesExistingScores: Boolean = false

  /** Generator sort value (reference generatorSortValue): the Column
    * generate ranks and topN-selects by. The fetch stage's IN-QUEUE
    * ordering follows the same value via [[generatorSortValueScalar]].
    */
  def generatorSortValue(score: Column): Column = score

  /** Scalar twin of [[generatorSortValue]] for the fetch scheduler's
    * in-queue ordering (the reference sorts its FetchItemQueues by the
    * generator sort value carried on the key, GeneratorJob SelectorEntry).
    * MUST compute the same function as the Column form — generate decides
    * WHICH rows fetch, this decides the per-queue order; divergent
    * implementations would make fetch order disagree with generate rank.
    * Default: identity (raw score), matching the Column default.
    */
  def generatorSortValueScalar(score: Float): Float = score
}

object ScoringFilter {

  /** This fork's hardcoded score flows, verbatim. */
  object Default extends ScoringFilter {
    def injectedScore(url: String, metaScore: Option[Float]): Float =
      metaScore.getOrElse(1.0f)
    def outlinkContribution(srcUrl: String, srcScore: Float,
        outlinkCount: Int): Float =
      srcScore / math.max(1, outlinkCount)
    def newRowScore(url: String, contrib: Float, customScore: Float): Float =
      if (customScore > 0f) customScore else contrib
  }

  /** An OPIC-flavored filter (reference scoring-opic plugin semantics,
    * simplified): rediscovered rows ACCUMULATE their batch contribution
    * on top of the stored score. Exists to prove the extension point
    * carries a real alternative policy end-to-end; Default remains the
    * parity-pinned behavior.
    */
  object Opic extends ScoringFilter {
    def injectedScore(url: String, metaScore: Option[Float]): Float =
      metaScore.getOrElse(1.0f)
    def outlinkContribution(srcUrl: String, srcScore: Float,
        outlinkCount: Int): Float =
      srcScore / math.max(1, outlinkCount)
    def newRowScore(url: String, contrib: Float, customScore: Float): Float =
      if (customScore > 0f) customScore else contrib
    override def updateExistingScore(score: Column, contrib: Column)
        : Column =
      score + coalesce(contrib, lit(0.0f))
    override def updatesExistingScores: Boolean = true
  }
}
