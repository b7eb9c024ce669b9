package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.expressions.{BpeTokenCount, HyperplaneSig64, LangId, MaxMatchCount, MaxMatchEncode, MinHash, MinHashSig, MinHashUnion, MultiMatchCount, NfcNorm, NfkcNorm, QualityScore, RollingHash64, SimHash64, StripAccents, StripInvisible, UnigramCost, UnigramEncode, VecMean, WinnowFingerprintPos, WinnowFingerprints, WordShingles, ZOrder62}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for sessions built with
  * `spark.sql.extensions=graft.GraftExtensions`. Sessions the engine does
  * not construct (the driver's) can call `SimHash64.register(spark)` /
  * `RollingHash64.register(spark)` directly — both paths install the same
  * function builders.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("simhash64"), SimHash64.info,
      children => SimHash64(children.head)))
    ext.injectFunction((FunctionIdentifier("rolling_hash64"),
      RollingHash64.info, children => RollingHash64(children.head)))
    ext.injectFunction((FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      children => WordShingles(children.head,
        MinHash.intArg(children(1), "shingle size k"))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      children => MinHashSig(children.head,
        MinHash.intArg(children(1), "signature size m"))))
    ext.injectFunction((FunctionIdentifier("hyperplane_sig64"),
      HyperplaneSig64.info, children => HyperplaneSig64(children.head)))
    ext.injectFunction((FunctionIdentifier("lang_id"),
      new ExpressionInfo(classOf[LangId].getName, "lang_id"),
      children => LangId(children.head)))
    ext.injectFunction((FunctionIdentifier("quality_score"),
      new ExpressionInfo(classOf[QualityScore].getName, "quality_score"),
      children => QualityScore(children.head)))
    ext.injectFunction((FunctionIdentifier("zorder62"), ZOrder62.info,
      children => ZOrder62(children.head, children(1))))
    ext.injectFunction((FunctionIdentifier("minhash_union"),
      MinHashUnion.info, children => MinHashUnion(children.head)))
    ext.injectFunction((FunctionIdentifier("nfc_norm"),
      new ExpressionInfo(classOf[NfcNorm].getName, "nfc_norm"),
      children => NfcNorm(children.head)))
    ext.injectFunction((FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[StripAccents].getName, "strip_accents"),
      children => StripAccents(children.head)))
    ext.injectFunction((FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName,
        "winnow_fingerprints"),
      children => WinnowFingerprints(children(0), children(1), children(2))))
    ext.injectFunction((FunctionIdentifier("winnow_fingerprint_pos"),
      new ExpressionInfo(classOf[WinnowFingerprintPos].getName,
        "winnow_fingerprint_pos"),
      children => WinnowFingerprintPos(children(0), children(1),
        children(2))))
    ext.injectFunction((FunctionIdentifier("bpe_token_count"),
      new ExpressionInfo(classOf[BpeTokenCount].getName, "bpe_token_count"),
      children => BpeTokenCount(children.head, children(1))))
    ext.injectFunction((FunctionIdentifier("vec_mean"),
      new ExpressionInfo(classOf[VecMean].getName, "vec_mean"),
      children => VecMean(children.head)))
    ext.injectFunction((FunctionIdentifier("nfkc_norm"),
      new ExpressionInfo(classOf[NfkcNorm].getName, "nfkc_norm"),
      children => NfkcNorm(children.head)))
    ext.injectFunction((FunctionIdentifier("strip_invisible"),
      new ExpressionInfo(classOf[StripInvisible].getName, "strip_invisible"),
      children => StripInvisible(children.head)))
    ext.injectFunction((FunctionIdentifier("multi_match_count"),
      new ExpressionInfo(classOf[MultiMatchCount].getName,
        "multi_match_count"),
      children => MultiMatchCount(children.head, children(1))))
    ext.injectFunction((FunctionIdentifier("max_match_encode"),
      new ExpressionInfo(classOf[MaxMatchEncode].getName,
        "max_match_encode"),
      children => MaxMatchEncode(children.head, children(1))))
    ext.injectFunction((FunctionIdentifier("max_match_count"),
      new ExpressionInfo(classOf[MaxMatchCount].getName, "max_match_count"),
      children => MaxMatchCount(children.head, children(1))))
    ext.injectFunction((FunctionIdentifier("unigram_encode"),
      new ExpressionInfo(classOf[UnigramEncode].getName, "unigram_encode"),
      children => UnigramEncode(children.head, children(1))))
    ext.injectFunction((FunctionIdentifier("unigram_cost"),
      new ExpressionInfo(classOf[UnigramCost].getName, "unigram_cost"),
      children => UnigramCost(children.head, children(1))))
    // pure time-range inner joins → bucketed equi joins (no nested loop)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinBucketing)
  }
}
