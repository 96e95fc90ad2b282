package graft

import graft.spark.Bpe
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level BPE token counting (X90): exact, deterministic subword
  * budgets under the fixed graft-bpe-v1 merges table. Fixtures are
  * hand-derived from the greedy lowest-rank merge order. */
class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .appName("graft-bpe-spec")
    .getOrCreate()

  private def count(s: String): Long =
    Bpe.countTokens(org.apache.spark.unsafe.types.UTF8String.fromString(s), Bpe.V1)

  test("hand-derived fixtures under graft-bpe-v1") {
    // "the": t h -> th (rank 0); th e -> the (rank 1) => 1 token
    assert(count("the") == 1L)
    // " theatre" merges to [space, the, at, re] (ranks 0,1,6,8) => 4;
    // with the leading word "the" => 5
    assert(count("the theatre") == 5L)
    assert(Bpe.tokenizeBytes("the theatre", Bpe.V1)
      .map(new String(_, "UTF-8")) == Seq("the", " ", "the", "at", "re"))
    // to(1) + " be"(2) + " or"(2) + " not"(3) + " to"(2) + " be"(2) = 12
    assert(count("to be or not to be") == 12L)
    assert(count("") == 0L)
    // every byte is covered: an unmergeable ASCII word counts its letters
    assert(count("xyzq") == 4L)
    // non-ASCII falls back to UTF-8 bytes (2 bytes, no merges)
    assert(count("é") == 2L)
  }

  test("tokenization is byte-lossless: token bytes concatenate to the input") {
    val texts = Seq("the theatre", "to be or not to be", "  spaced  out ",
      "digits 2024 and 1999!", "café nice", "don't stop")
    texts.foreach { t =>
      val bytes = Bpe.tokenizeBytes(t, Bpe.V1).foldLeft(Array.empty[Byte])(_ ++ _)
      assert(java.util.Arrays.equals(bytes, t.getBytes("UTF-8")), s"lossy for '$t'")
      assert(Bpe.tokenizeBytes(t, Bpe.V1).length == count(t), s"count mismatch '$t'")
    }
  }

  test("pathological unbroken blobs count in bounded time (segmented)") {
    // a 200 KB single pre-token (no merges apply) — the quadratic greedy
    // loop would take minutes unsegmented; segmented it is instant, exact,
    // and byte-lossless
    val blob = "x" * 200000
    val t0 = System.nanoTime()
    assert(count(blob) == 200000L)
    assert((System.nanoTime() - t0) / 1e9 < 20.0, "segmentation must bound the loop")
    assert(Bpe.tokenizeBytes(blob, Bpe.V1).length == count(blob))
    // a blob that DOES merge: 'ththth...' halves via the t-h merge, and
    // tokenize/count agree across segment boundaries
    val merging = "th" * 50000
    assert(count(merging) == Bpe.tokenizeBytes(merging, Bpe.V1).length.toLong)
    val joined = Bpe.tokenizeBytes(merging, Bpe.V1).foldLeft(Array.empty[Byte])(_ ++ _)
    assert(java.util.Arrays.equals(joined, merging.getBytes("UTF-8")))
  }

  test("deterministic across calls and threads; custom merges tables work") {
    val t = "the theatre and the band"
    val first = count(t)
    assert((1 to 100).forall(_ => count(t) == first))
    // a custom GPT-2-format table: only "a b" merges
    val custom = Bpe.MergeTable.parse("test", "a b\n")
    def c2(s: String) = Bpe.countTokens(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), custom)
    // "ab"=1 merged; " ab" = [space, ab] = 2
    assert(c2("ab ab") == 3L)
    // and v1 != whitespace counting on the same text (subword budgets)
    assert(first != t.split("\\s+").length.toLong)
  }

  test("pre-tokenizer treats Unicode whitespace as whitespace (NBSP)") {
    // Python's `re` \s is Unicode; Java's default is ASCII-only. The
    // pattern must compile with UNICODE_CHARACTER_CLASS or U+00A0 joins
    // the punctuation-run branch and counts diverge from the reference
    // tokenizer. Pin it with a merge that can ONLY fire if NBSP is
    // (wrongly) glued into the adjacent punctuation pre-token:
    // 0xA0 maps to U+0142 in the byte->unicode alphabet, so the word
    // "<NBSP>!" would be [0xC2-char][U+0142][!] and the merge below folds
    // it to 2 symbols; correct Unicode-\s pre-tokenization keeps NBSP
    // and "!" in separate words (2 + 1 symbols) and the merge never fires.
    val nbspGlue = Bpe.MergeTable.parse("nbsp-glue", "\u0142 !\n")
    def c(s: String) = Bpe.countTokens(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), nbspGlue)
    assert(c("x\u00a0!") == 4L,
      "NBSP must pre-tokenize as whitespace, not punctuation")
    // byte-losslessness holds across the boundary either way
    val toks = Bpe.tokenizeBytes("x\u00a0!", nbspGlue)
    assert(java.util.Arrays.equals(
      toks.foldLeft(Array.empty[Byte])(_ ++ _), "x\u00a0!".getBytes("UTF-8")))
  }

  test("the expression rides whole-stage codegen and handles nulls") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(Some("the theatre"), None, Some("")).toDF("text")
    val got = df.select(
      graft.ops.TextAnalysis.bpeTokenCount(col("text")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(got.toSeq == Seq(5L, null, 0L))
    // plan stays inside WholeStageCodegen (no CodegenFallback boundary) —
    // over a real scan (a local Seq folds to a LocalTableScan with no
    // codegen stage to observe)
    val plan = spark.range(10)
      .selectExpr("concat('the doc ', CAST(id AS STRING)) AS text")
      .select(graft.ops.TextAnalysis.bpeTokenCount(col("text")))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix is the WholeStageCodegen marker in plan strings
    assert(plan.contains("*(1) Project [bpe_token_count"), plan)
  }

  test("packing with exact BPE budgets (the q105 shape)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "the theatre", "a"), (2L, "to be or not to be", "a"),
      (3L, "xyzq", "b")).toDF("doc_id", "text", "source")
    val out = graft.ops.Packing.tokenChunks(docs, "doc_id", "text", "source",
        budgetTokens = 8, counter = c => graft.ops.TextAnalysis.bpeTokenCount(c))
      .select(col("doc_id"), col("n_tokens"), col("chunk_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc1: 5 tokens at offset 0 -> chunk 0; doc2 starts at 5 -> chunk 0
    // (floor(5/8)); doc3 is shard b, chunk 0
    assert(out == Set((1L, 5L, 0L), (2L, 12L, 0L), (3L, 4L, 0L)), out.toString)
  }
}
