package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** Distributed BPE training + native encode (SURVEY §2.5 55t). The
  * trainer's exact pin is the hand-computed merge sequence on the
  * Sennrich et al. 2016 paper corpus (low/lower/newest/widest) — the
  * corpus-scale pair-count pass is separately oracle-gated (q_bpe_pairs).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** The paper corpus, one doc per word occurrence so wordFreqs sees the
    * classic weights {low:5, lower:2, newest:6, widest:3}. */
  private def sennrich = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
  ).zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")

  test("train replays the paper's merge sequence with deterministic ties") {
    // hand-derived under (cnt DESC, a ASC, b ASC):
    //   (e,s)=9 beats (s,t)/(t,</w>) on the a-tiebreak; then (es,t)=9,
    //   (est,</w>)=9, (l,o)=7 beats (o,w), (lo,w)=7; at 6: (e,w) beats
    //   (n,e)/(w,est</w>), then (ew,est</w>) beats (n,ew)
    val merges = Bpe.train(sennrich, "text", numMerges = 7)
    assert(merges == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w"),
      ("e", "w"), ("ew", "est</w>")))
  }

  test("encode segments with trained merges; unseen words fall back to chars") {
    val merges = Bpe.train(sennrich, "text", numMerges = 5)
    val out = Seq((1L, "lowest"), (2L, "newer"), (3L, null: String))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Bpe.encode(col("text"), merges).as("toks"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
    // the paper's example: lowest -> low + est</w>
    assert(out(1L) == Seq("low", "est</w>"))
    // 'newer' shares no trained merge at 5 ranks -> pure char fallback
    assert(out(2L) == Seq("n", "e", "w", "e", "r", "</w>"))
    assert(out(3L) == null, "null text propagates")
  }

  test("merge pass is greedy left-to-right in both column and native forms") {
    // [a,a,a,a] -> [aa,aa]; [a,a,a] -> [aa,a] — the single-pass pairing
    val df = Seq((1L, "aaaa"), (2L, "aaa")).toDF("id", "w")
    val colForm = df.select(col("id"),
        Bpe.mergePass(Bpe.charSyms(col("w")), "a", "a").as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(colForm(1L) == Seq("aa", "aa", "</w>"))
    assert(colForm(2L) == Seq("aa", "a", "</w>"))
    val native = df.select(col("id"),
        Bpe.encode(col("w"), Seq(("a", "a"))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(native == colForm, "encoder must replay exactly the trainer's pass")
  }

  test("trainer state stays vocab-sized and is total on degenerate corpora") {
    // empty corpus: no merges, no failure
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Bpe.train(empty, "text", numMerges = 3).isEmpty)
    // single-char vocab exhausts after its two possible merges
    val tiny = Seq((1L, "a a a")).toDF("doc_id", "text")
    val merges = Bpe.train(tiny, "text", numMerges = 10)
    assert(merges == Seq(("a", "</w>")),
      "one pair exists; after merging, no adjacent pairs remain")
    // real corpus: 8 merges come back ranked and distinct
    val docs = Tables(spark, sf).documents
    val real = Bpe.train(docs, "text", numMerges = 8)
    assert(real.size == 8 && real.distinct.size == 8)
  }
}
