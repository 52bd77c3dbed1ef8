package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** M9 serving path for TREE ensembles as pure column algebra — the
  * m12b `scoreLogistic` pattern applied to trees: a FIXED tree
  * structure (splits and leaf values as literals) compiles to nested
  * CASE WHEN expressions, so scoring a trained GBT is one codegen'd
  * projection — no MLlib transformer, no UDF, no vector column — and
  * every operation is restatable in any SQL engine, which is what puts
  * the RF/GBT *serving* semantics under the hash oracle (training
  * stays MLlib/spec-gated; `FD/model.py:119` fits, `FD/consumer.py:60-66`
  * serves stored models).
  *
  * Determinism contract (the m12b discipline): split comparisons are
  * `feature <= threshold` on doubles (MLlib's `ContinuousSplit` rule),
  * leaf values are double literals, the ensemble margin folds STRICTLY
  * left-to-right in tree order — MLlib's `ddot(pred, weights)` order,
  * though a loaded native BLAS may vectorize that sum and drift a
  * couple of ulps (the MLSpec gate pins agreement at ≤1e-12 relative;
  * cross-ENGINE exactness is pinned by the generated oracle, which
  * replays this fold, not BLAS) — and the one transcendental
  * (the GBT logistic link `1/(1+e^{-2m})`) is 7dp-rounded so a 1-ulp
  * cross-engine `exp` drift sits ~1e9 below the rounding boundary.
  * [[treeSql]]/[[gbtSql]] emit the IDENTICAL algebra for the DuckDB
  * oracle from the same structure (the `irlsOracleSql` discipline: one
  * Scala source generates both sides, so they cannot diverge).
  *
  * Scale shape: scoring is a stateless per-row projection inside
  * whole-stage codegen — no shuffle, no state, embarrassingly parallel
  * at any corpus size; a 500-node production ensemble is still just a
  * larger generated expression (HotSpot's JIT ceiling, the e01 lesson,
  * is per-STAGE — a scorer this shape feeds a narrow aggregate, which
  * Spark splits naturally).
  */
object TreeScorer {

  /** A fixed decision tree over named double feature columns. */
  sealed trait TreeNode
  /** Terminal value (a GBT tree's margin contribution). */
  final case class Leaf(value: Double) extends TreeNode
  /** Continuous split: `feat <= thr` goes low, else high (MLlib's
    * `ContinuousSplit.shouldGoLeft`). */
  final case class Branch(feat: String, thr: Double,
                          lo: TreeNode, hi: TreeNode) extends TreeNode

  /** The tree as one nested CASE expression (codegen'd). */
  def treeCol(t: TreeNode): Column = t match {
    case Leaf(v) => lit(v)
    case Branch(f, thr, lo, hi) =>
      when(col(f).cast("double") <= lit(thr), treeCol(lo))
        .otherwise(treeCol(hi))
  }

  /** The identical tree as DuckDB SQL (oracle side). `Double.toString`
    * round-trips exactly, so both engines parse the same literal to
    * the same bits. */
  def treeSql(t: TreeNode): String = t match {
    case Leaf(v) => s"(${java.lang.Double.toString(v)})"
    case Branch(f, thr, lo, hi) =>
      s"(CASE WHEN CAST($f AS DOUBLE) <= " +
        s"${java.lang.Double.toString(thr)} THEN ${treeSql(lo)} " +
        s"ELSE ${treeSql(hi)} END)"
  }

  /** Ensemble margin: Σ wᵢ·treeᵢ folded left-to-right from 0.0 —
    * MLlib's `ddot` order. */
  def marginCol(trees: Seq[(Double, TreeNode)]): Column =
    trees.foldLeft(lit(0.0)) { case (acc, (w, t)) =>
      acc + lit(w) * treeCol(t)
    }

  /** [[marginCol]]'s oracle twin, parenthesized identically. */
  def marginSql(trees: Seq[(Double, TreeNode)]): String =
    trees.foldLeft("(0.0)") { case (acc, (w, t)) =>
      s"($acc + (${java.lang.Double.toString(w)} * ${treeSql(t)}))"
    }

  /** Score a frame through a fixed GBT classification ensemble:
    * appends `margin` (raw, for parity gates), `probaCol` = the MLlib
    * binary-logloss link `1/(1+e^{-2·margin})` at 7dp, and `predCol`
    * (proba ≥ 0.5 ⟺ margin ≥ 0).
    */
  def scoreGbt(df: DataFrame, trees: Seq[(Double, TreeNode)],
               probaCol: String = "proba",
               predCol: String = "pred"): DataFrame = {
    require(trees.nonEmpty, "at least one tree")
    df.withColumn("margin", marginCol(trees))
      .withColumn(probaCol,
        round(lit(1.0) / (lit(1.0) + exp(lit(-2.0) * col("margin"))), 7))
      .withColumn(predCol, when(col(probaCol) >= 0.5, 1).otherwise(0))
  }

  /** SQL for the 7dp GBT probability over a `margin` column. */
  def gbtProbaSql(marginExpr: String): String =
    s"round(1.0 / (1.0 + exp(-2.0 * $marginExpr)), 7)"

  /** Extract a fixed [[TreeNode]] from a fitted MLlib tree (the MLSpec
    * parity gate's bridge): continuous splits only — the engine's
    * feature pipeline one-hot-encodes categoricals before any tree
    * sees them, so a categorical split here is a contract violation,
    * not a case to silently mishandle.
    */
  def fromMllib(node: org.apache.spark.ml.tree.Node,
                featNames: Seq[String]): TreeNode = node match {
    case l: org.apache.spark.ml.tree.LeafNode => Leaf(l.prediction)
    case b: org.apache.spark.ml.tree.InternalNode => b.split match {
      case cs: org.apache.spark.ml.tree.ContinuousSplit =>
        Branch(featNames(cs.featureIndex), cs.threshold,
          fromMllib(b.leftChild, featNames),
          fromMllib(b.rightChild, featNames))
      case other =>
        throw new IllegalArgumentException(
          s"only continuous splits are extractable, got $other")
    }
  }

  /** A fitted GBT classification model as the literal ensemble. */
  def fromGbt(model: org.apache.spark.ml.classification.GBTClassificationModel,
              featNames: Seq[String]): Seq[(Double, TreeNode)] =
    model.trees.zip(model.treeWeights).map { case (t, w) =>
      w -> fromMllib(t.rootNode, featNames)
    }.toSeq

  // ---------- random-forest serving (m12d) ----------

  /** Score a frame through a fixed random-forest CLASSIFICATION
    * ensemble (binary): each tree's leaf literal is its P(class 1)
    * vote — the per-leaf class-count normalization
    * `RandomForestClassificationModel.predictRaw` performs per tree —
    * and the ensemble folds the votes STRICTLY left-to-right from 0.0
    * in tree order (predictRaw's loop). Appends `vote_sum` (raw, for
    * the MLSpec parity gate), `probaCol` = round(vote_sum/numTrees, 7)
    * — MLlib's `normalize(votes)` for the binary case — and `predCol`
    * = argmax with MLlib's tie rule (equal votes → class 0, so the
    * threshold is STRICT `> 0.5`, unlike the logistic/GBT `≥`).
    * Same scale shape as [[scoreGbt]]: one codegen'd stateless
    * projection, no shuffle.
    */
  def scoreRf(df: DataFrame, trees: Seq[TreeNode],
              probaCol: String = "proba",
              predCol: String = "pred"): DataFrame = {
    require(trees.nonEmpty, "at least one tree")
    df.withColumn("vote_sum",
        trees.foldLeft(lit(0.0))((acc, t) => acc + treeCol(t)))
      .withColumn(probaCol,
        round(col("vote_sum") / lit(trees.size.toDouble), 7))
      .withColumn(predCol, when(col(probaCol) > 0.5, 1).otherwise(0))
  }

  /** [[scoreRf]]'s vote-sum oracle twin, parenthesized identically. */
  def rfVoteSql(trees: Seq[TreeNode]): String =
    trees.foldLeft("(0.0)")((acc, t) => s"($acc + ${treeSql(t)})")

  /** SQL for the 7dp RF probability over a `vote_sum` column. */
  def rfProbaSql(voteExpr: String, numTrees: Int): String =
    s"round($voteExpr / ${numTrees}.0, 7)"

  /** Extract a fitted binary RF classifier as fixed probability-vote
    * trees: leaf value = stats(1)/Σstats — the per-tree normalization
    * inside `predictRaw` (zero-total leaves vote 0.0, matching its
    * `total != 0` guard). Split extraction shares [[fromMllib]]'s
    * continuous-split contract.
    */
  def fromRf(
      model: org.apache.spark.ml.classification.RandomForestClassificationModel,
      featNames: Seq[String]): Seq[TreeNode] = {
    require(model.numClasses == 2,
      s"binary forests only, got ${model.numClasses} classes")
    def conv(node: org.apache.spark.ml.tree.Node): TreeNode = node match {
      case l: org.apache.spark.ml.tree.LeafNode =>
        val stats = org.apache.spark.ml.graft.TreeBridge.leafStats(l)
        val total = stats.sum
        Leaf(if (total != 0.0) stats(1) / total else 0.0)
      case b: org.apache.spark.ml.tree.InternalNode => b.split match {
        case cs: org.apache.spark.ml.tree.ContinuousSplit =>
          Branch(featNames(cs.featureIndex), cs.threshold,
            conv(b.leftChild), conv(b.rightChild))
        case other =>
          throw new IllegalArgumentException(
            s"only continuous splits are extractable, got $other")
      }
    }
    model.trees.map(t => conv(t.rootNode)).toSeq
  }
}
