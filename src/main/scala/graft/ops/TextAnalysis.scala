package graft.ops

import graft.spark.{LangId, TextFingerprint}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation: token counting, quality scoring,
  * language identification, fingerprinting. Everything except the two custom
  * expressions is built-in `functions._` (whole-stage codegen'd); the quality
  * metrics are defined with engine-portable arithmetic so a SQL oracle can
  * reproduce them bit-for-bit. */
object TextAnalysis {

  /** Whitespace token count — `size(split(text, '\s+'))`, with the empty
    * string counting zero tokens (matches `len(string_split_regex(..))`
    * semantics used by the oracle modulo the empty-leading-token case). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count: splits on word/number/punctuation boundaries the
    * way byte-pair tokenizers pre-tokenize (letters runs, digit runs, single
    * punctuation marks each count). */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"), c => length(c) > 0))

  def charCount(text: Column): Column = length(text)

  /** Punctuation character count (portable character class). */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,;:!?'\"()\\[\\]{}-]", ""))

  /** English stopword hits among whitespace tokens. */
  def stopwordCount(text: Column): Column = {
    val stop = Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for")
    size(filter(split(lower(text), "\\s+"),
      t => stop.map(s => t === lit(s)).reduce(_ || _)))
  }

  /** Deterministic quality score in [0,1]: mean word length band, stopword
    * ratio and punctuation-density terms — all exact integer arithmetic until
    * one final double division, so any engine reproduces it bit-for-bit. */
  def qualityScore(text: Column): Column =
    qualityScoreFromCounts(length(text), tokenCount(text),
      stopwordCount(text), punctCount(text))

  /** [[qualityScore]] over ALREADY-COMPUTED counts. The count inputs are
    * lambda/regex expressions that sit outside whole-stage-codegen common-
    * subexpression elimination, so a query selecting the counts AND the
    * quality should feed the selected columns here instead of paying for
    * each count twice (q21 does). */
  def qualityScoreFromCounts(nChar: Column, nTok: Column,
                             nStop: Column, nPunct: Column): Column = {
    // components scaled ×1000 in integer space, combined, then one division
    val avgLenOk = when(nTok === 0, lit(0)).otherwise(
      when(nChar * lit(10) >= nTok * lit(30) && nChar * lit(10) <= nTok * lit(120), lit(1000))
        .otherwise(lit(0)))
    val stopTerm = when(nTok === 0, lit(0)).otherwise(
      least(nStop * lit(1000) * lit(5) / nTok, lit(1000)))
    val punctOk = when(nChar === 0, lit(0)).otherwise(
      when(nPunct * lit(10) <= nChar, lit(1000)).otherwise(lit(0)))
    ((avgLenOk + stopTerm + punctOk).cast("double") / lit(3000.0)).as("quality")
  }

  /** Exact byte-level-BPE token count (X90) under the fixed `graft-bpe-v1`
    * merges table — or a custom GPT-2-format merges file's text. The
    * production-true token budget for packing/budget/mixing, vs. the
    * whitespace heuristic of [[tokenCount]]. */
  def bpeTokenCount(text: Column, mergesText: Option[String] = None): Column =
    Shims.column(graft.spark.BpeTokenCount(Shims.expression(text), mergesText))

  def langId(text: Column): Column = Shims.column(LangId(Shims.expression(text)))

  def fingerprint(text: Column): Column =
    Shims.column(TextFingerprint(Shims.expression(text)))

  /** Token-level repetition/boilerplate metrics (the Gopher/C4-style
    * repetition rules, restated for single-line documents):
    *  - `top_bigram_frac`: occurrences of the most frequent word bigram over
    *    total bigrams (boilerplate templates repeat their phrasing);
    *  - `dup_token_frac`: fraction of tokens that are repeats of an earlier
    *    token.
    * Both are PER-ROW array computations (sort + one fold over the row's own
    * bigrams) — the whole operator is a map-side projection with zero
    * shuffle, so at 100 TB it costs exactly one pass over the corpus. The
    * max-multiplicity fold runs over the row-local sorted bigram array;
    * nothing explodes into a corpus-wide (doc, gram) space. */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Staged projections so each array materializes ONCE per row: lambda
    // (higher-order) expressions sit outside whole-stage-codegen common-
    // subexpression elimination, so a single-Project formulation would
    // re-tokenize per textual reference (measured 6x slower). CollapseProject
    // keeps the stages separate — it never inlines an expensive alias that is
    // consumed more than once — and the chain still fuses into one codegen
    // stage, so this stays a zero-shuffle single pass.
    val toks = df.select(col(idCol),
      expr(s"filter(split($textCol, '\\\\s+'), x -> x != '')").as("__toks"))
    val arrs = toks.select(col(idCol), col("__toks"),
      expr("CASE WHEN size(__toks) < 2 THEN CAST(array() AS ARRAY<STRING>) " +
        "ELSE transform(sequence(0, size(__toks) - 2), " +
        "i -> concat(element_at(__toks, i + 1), ' ', element_at(__toks, i + 2))) END")
        .as("__bgs"))
    // longest equal-run in the sorted bigram array = max bigram multiplicity
    val maxMult =
      """aggregate(array_sort(__bgs),
        |  named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0),
        |  (acc, x) -> named_struct(
        |    'prev', x,
        |    'run', CASE WHEN acc.prev IS NOT NULL AND x = acc.prev THEN acc.run + 1 ELSE 1 END,
        |    'best', greatest(acc.best,
        |      CASE WHEN acc.prev IS NOT NULL AND x = acc.prev THEN acc.run + 1 ELSE 1 END)),
        |  acc -> acc.best)""".stripMargin
    val counts = arrs.select(col(idCol),
      expr("size(__toks)").as("__n_toks"),
      expr("size(array_distinct(__toks))").as("__n_dtoks"),
      expr("size(__bgs)").as("__n_bgs"),
      expr(maxMult).as("__max_mult"))
    counts.select(col(idCol),
      col("__n_toks").cast("long").as("n_tokens"),
      expr("CASE WHEN __n_bgs = 0 THEN 0D ELSE CAST(__max_mult AS DOUBLE) / __n_bgs END")
        .as("top_bigram_frac"),
      expr("CASE WHEN __n_toks = 0 THEN 0D ELSE " +
        "CAST(__n_toks - __n_dtoks AS DOUBLE) / __n_toks END")
        .as("dup_token_frac"))
  }

  // ---- PII detection / redaction -------------------------------------

  /** PII patterns shared by detection and redaction. Deliberately
    * ENGINE-PORTABLE: plain character classes and greedy quantifiers only —
    * no `\b` word boundaries (ASCII-only in RE2 engines but Unicode-aware
    * in Java, so the same corpus could count differently), no lookarounds
    * (absent from RE2 entirely). Under leftmost-first greedy matching these
    * behave identically in Spark (java.util.regex) and the DuckDB/RE2-style
    * engines a SQL oracle runs on. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
  /** Account/phone-shaped digit runs (9+ digits). Must be applied AFTER
    * email and IPv4 redaction so their digits are already collapsed. */
  val IdNumberPattern = "\\d{9,}"

  /** Detect and redact PII in one map-side pass: per-row match counts plus
    * a `<textCol>_redacted` column with emails, IPv4s, then long digit runs
    * replaced by typed tokens. Each count is taken on the SAME text its
    * replacement stage sees (emails on the original, IPv4s after email
    * redaction, digit runs after both), so `n_X` always equals the number
    * of `<X>` tokens emitted — a digit run inside an email is redacted as
    * part of the email, and is not double-counted as an id number. Pure
    * built-in `regexp_extract_all`/`regexp_replace` — whole-stage
    * codegen'd, zero shuffle, so at 100 TB this is one streaming pass over
    * the corpus (the scrub stage every training pipeline runs first). */
  /** Corpus-wide most-frequent word n-grams — the boilerplate-mining
    * primitive (CCNet-style: the top shared n-grams of a crawl are its
    * navigation chrome, cookie banners and license footers; their counts
    * feed both boilerplate strip-lists and contamination screens).
    * Whitespace-tokenized, n-grams joined by single spaces; ties broken by
    * n-gram text for a deterministic result.
    *
    * Scale notes: built-ins end to end (split/transform/explode → hash
    * aggregate), so the fan-out codegens and partial-aggregates map-side;
    * the shuffle carries (ngram, partial count) pairs — never documents —
    * and the final top-k is a single reduction over distinct n-grams. */
  def topNgrams(df: DataFrame, textCol: String = "text",
                n: Int = 3, k: Int = 20): DataFrame = {
    require(n >= 1 && k >= 1, s"topNgrams: n=$n and k=$k must be positive")
    val words = df.select(
      expr(s"filter(split($textCol, '\\\\s+'), w -> w != '')").as("__words"))
    // documents shorter than n words contribute nothing (sequence(1, 0)
    // would DESCEND, so the short case must be an explicit empty array)
    val grams = words.select(explode(expr(
      s"""CASE WHEN size(__words) >= $n
         |THEN transform(sequence(1, size(__words) - ${n - 1}),
         |  i -> concat_ws(' ', slice(__words, i, $n)))
         |ELSE array() END""".stripMargin)).as("ngram"))
    grams.groupBy("ngram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram").asc)
      .limit(k)
  }

  def redactPii(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    // staged projections (same CSE discipline as repetitionMetrics): each
    // intermediate redaction materializes once per row
    df.withColumn("__post_email", regexp_replace(t, EmailPattern, "<EMAIL>"))
      .withColumn("__post_ip", regexp_replace(col("__post_email"), Ipv4Pattern, "<IP>"))
      .withColumn("n_emails",
        size(regexp_extract_all(t, lit(EmailPattern), lit(0))))
      .withColumn("n_ipv4",
        size(regexp_extract_all(col("__post_email"), lit(Ipv4Pattern), lit(0))))
      .withColumn("n_idnums",
        size(regexp_extract_all(col("__post_ip"), lit(IdNumberPattern), lit(0))))
      .withColumn(s"${textCol}_redacted",
        regexp_replace(col("__post_ip"), IdNumberPattern, "<ID>"))
      .drop("__post_email", "__post_ip")
  }

  /** Chunk documents into fixed-size token windows with overlap — the
    * RAG/context-window splitter: chunk `i` covers tokens
    * `[i*stride, i*stride + chunkTokens)` where `stride = chunkTokens −
    * overlapTokens`, so consecutive chunks share `overlapTokens` tokens and
    * every token lands in at least one chunk (the tail chunk may be short;
    * empty documents produce no chunk). Output: (id, chunk_idx, chunk,
    * n_tokens).
    *
    * Pure built-ins (`split`/`sequence`/`explode`/`slice`/`array_join`), so
    * Catalyst plans the fan-out as a generator: zero shuffle, zero UDF — at
    * 100 TB chunking is one streaming pass whose output partitioning
    * follows the input's. */
  def chunkText(df: DataFrame, idCol: String, textCol: String,
                chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive; got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlapTokens must be in [0, chunkTokens); got $overlapTokens of $chunkTokens")
    val stride = chunkTokens - overlapTokens
    df.select(col(idCol),
        filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .where(col("__n") > 0)
      .withColumn("chunk_idx", explode(sequence(lit(0L),
        ceil(greatest(col("__n") - lit(overlapTokens), lit(1))
          .cast("double") / stride).cast("long") - 1)))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("__toks"),
          (col("chunk_idx") * stride + 1).cast("int"), lit(chunkTokens)), " ").as("chunk"),
        size(slice(col("__toks"),
          (col("chunk_idx") * stride + 1).cast("int"), lit(chunkTokens))).as("n_tokens"))
  }

  /** Standard per-document feature set over a corpus. Quality is derived
    * from the SELECTED counts (q21's staged shape): the count expressions
    * are lambda/regex forms outside codegen common-subexpression
    * elimination, so deriving quality in the same projection would evaluate
    * each count twice per row. */
  def documentFeatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol),
        charCount(t).as("n_chars"),
        tokenCount(t).as("n_tokens"),
        subwordCount(t).as("n_subwords"),
        punctCount(t).as("n_punct"),
        stopwordCount(t).as("n_stopwords"),
        langId(t).as("lang_pred"),
        fingerprint(t).as("fingerprint"))
      .select(col(idCol), col("n_chars"), col("n_tokens"), col("n_subwords"),
        col("n_punct"), col("n_stopwords"),
        qualityScoreFromCounts(col("n_chars"), col("n_tokens"),
          col("n_stopwords"), col("n_punct")).as("quality"),
        col("lang_pred"), col("fingerprint"))
  }

  /** Cross-document repeated-substring metrics (X73) — the "dedup the
    * SPANS, not just the documents" signal from Lee et al. 2022
    * (arXiv:2107.06499): boilerplate, licenses and templated text recur as
    * long exact token runs across otherwise-distinct documents, and
    * document-level dedup never sees them. Every `window`-token sliding
    * window is hashed (md5 of the space-joined tokens — engine-portable);
    * a window duplicated across >= 2 DISTINCT documents marks its token
    * span, and per document the UNION of marked spans yields
    * `covered_tokens` / `dup_windows` — the repeated-substring exposure a
    * curation pass filters or strips on.
    *
    * Scale shape: the text never shuffles — the fan-out ships (hash16B,
    * doc_id, pos) triples, exchanged ONCE by (hash, doc-salt) and REUSED by
    * both consumers (the physical plan materializes that exchange a single
    * time, so the expensive tokenize+md5 generate runs exactly once); the
    * dup-hash test is a two-stage min/max aggregation on the hash whose
    * partial stage runs inside the salted partitions — a boilerplate hash
    * occurring in millions of documents collapses map-side instead of
    * funneling through one task (the r21 window form's skew exposure);
    * the dup-hash set then semi-joins back onto the same reused exchange
    * (AQE broadcasts it when small, splits probe skew otherwise);
    * span-union coverage is ONE window function keyed by doc_id using the
    * classic sorted-interval telescope sum(min(window, pos - prev_pos)). */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                      window: Int = 15): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    val toks = filter(split(trim(col(textCol)), "\\s+"), w => length(w) > 0)
    val base = df.select(col(idCol), toks.as("ws"))
    // unhex(md5(...)): the SAME md5 equality classes (hex → bytes is a
    // bijection) carried as 16 raw bytes instead of a 32-char hex string —
    // half the exchange bytes and a cheaper aggregation/join key (§2.3
    // narrower types)
    val wins = base
      .select(col(idCol),
        posexplode_outer(
          when(size(col("ws")) >= window,
            transform(sequence(lit(1), size(col("ws")) - window + 1),
              i => unhex(md5(concat_ws(" ", slice(col("ws"), i, lit(window))))))))
          .as(Seq("pos", "h")))
    // "window hash seen in >= 2 distinct docs" as a SHARED salted exchange
    // feeding (a) a two-stage min(id)/max(id) aggregation by h and (b) the
    // row stream the resulting dup-hash set semi-joins back onto. Both
    // consumers reference the SAME repartition subtree, so the physical
    // planner materializes one exchange and reuses it — the generate above
    // is evaluated once (pinned by OpsSpec's metrics test). The salt keeps
    // the exchange AND the partial aggregation skew-free: a hot boilerplate
    // hash spreads over up to 64 partitions by document and collapses to
    // one partial row per partition before the (tiny) final agg exchange.
    // The r21 window form (min/max over Window.partitionBy(h)) evaluated
    // the generate once too but routed every occurrence of a hot hash to
    // ONE task with no partial aggregation — a single-task hotspot at
    // corpus scale.
    val shuffled = wins.where(col("h").isNotNull)
      .withColumn("__salt", pmod(hash(col(idCol)), lit(64)))
      .repartition(col("h"), col("__salt"))
    // max(pos) is never used for its value: `__p < 0` is never true (pos is
    // a posexplode ordinal), so the filter is exactly `min != max` — but the
    // reference keeps `pos` alive below the aggregation branch's copy of the
    // exchange, so column pruning cannot specialize it away from the row
    // branch's copy: the two subtrees stay canonically identical and the
    // planner REUSES one materialized exchange instead of evaluating the
    // generate twice. (An aggregate over struct(id, pos) would pin `pos`
    // more directly, but struct buffers demote the whole aggregation to
    // SortAggregate — measured two extra full sorts.)
    val dupHashes = shuffled
      .groupBy(col("h"))
      .agg(min(col(idCol)).as("__mn"), max(col(idCol)).as("__mx"),
        max(col("pos")).as("__p"))
      .where(col("__mn") =!= col("__mx") || col("__p") < lit(0))
      .select(col("h"))
    // INNER join, not left_semi: dupHashes is unique by h (it is a groupBy
    // result), so the inner join keeps exactly the semi-join's rows — and
    // unlike a semi join it is not pushed below the repartition by
    // PushDownLeftSemiAntiJoin, which would strip the probe side's
    // exchange and with it the reuse that makes the generate run once.
    val dupWins = shuffled.join(dupHashes, Seq("h"), "inner")
      .select(col(idCol), col("pos"))
    val covered = dupWins
      .withColumn("prev", lag("pos", 1)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col(idCol)).orderBy(col("pos"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("dup_windows"),
        sum(when(col("prev").isNull, lit(window))
          .otherwise(least(lit(window), col("pos") - col("prev"))))
          .as("covered_tokens"))
    base.select(col(idCol), size(col("ws")).cast("long").as("n_tokens"))
      .join(covered, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"))
  }

  /** Gopher/C4-style document quality rules (X70): the published filter
    * heuristics from the Gopher "quality filtering" recipe (Rae et al. 2021,
    * arXiv:2112.11446 §A1.1) and C4's cleaning pass (Raffel et al. 2020,
    * arXiv:1910.10683 §2.2), re-expressed with INTEGER-EXACT arithmetic so a
    * SQL oracle reproduces every flag bit-for-bit (a float ratio compare
    * would flap on engine rounding). One boolean per rule plus the overall
    * conjunction — per-rule flags instead of a single verdict because a
    * curation funnel needs to know WHICH rule kills a document.
    *
    * Rules (pass = keep):
    *  - `r_word_count`:   50 <= words <= 100000 (Gopher doc-length gate)
    *  - `r_mean_word_len`: mean word length in [3, 10] chars
    *  - `r_symbol_ratio`:  (# chars + '...' runs) <= 10% of words
    *  - `r_alpha_words`:   >= 80% of words contain a letter
    *  - `r_bullet_lines`:  <= 10% of non-empty lines start with a bullet
    *  - `r_ellipsis_lines`: <= 30% of non-empty lines end with '...'
    *  - `r_stopwords`:     >= 2 DISTINCT common stopwords present
    *  - `r_no_lorem`:      no 'lorem ipsum' boilerplate (C4)
    *  - `r_no_brace`:      no '{' (C4's code/markup tell)
    * Ratio rules over an empty denominator pass vacuously (the word-count
    * gate already fails empty docs).
    *
    * Scale: one zero-shuffle map pass, all built-in expressions (split /
    * filter / transform / aggregate lambdas) — text never leaves its
    * partition; the output is id + metrics + booleans. */
  def gopherQualityFlags(df: DataFrame, idCol: String, textCol: String,
                         keepCols: Seq[String] = Nil): DataFrame = {
    val t = col(textCol)
    val words = filter(split(trim(t), "\\s+"), w => length(w) > 0)
    val nWords = size(words)
    val sumWordChars = aggregate(words, lit(0), (acc, w) => acc + length(w))
    val alphaWords = size(filter(words, w => w.rlike("[A-Za-z]")))
    val stopSet = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val distinctStops = size(array_intersect(
      array(stopSet.map(lit): _*), transform(words, w => lower(w))))
    val hashes = length(t) - length(regexp_replace(t, "#", ""))
    // removed matches are whole '...' runs, so the byte delta is an exact
    // multiple of 3 — the division stays integer-exact; cast pins the type
    val ellipses =
      ((length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3).cast("int")
    val lines = filter(transform(split(t, "\n"), l => trim(l)), l => length(l) > 0)
    val nLines = size(lines)
    val bulletLines = size(filter(lines, l =>
      l.startsWith("-") || l.startsWith("*")))
    val ellipsisLines = size(filter(lines, l => l.endsWith("...")))
    df.select(Seq(col(idCol)) ++ keepCols.map(col) ++ Seq(
      nWords.cast("long").as("n_words"),
      (nWords >= 50 && nWords <= 100000).as("r_word_count"),
      // 3 <= sum/words <= 10  ==  3*words <= sum AND sum <= 10*words
      (nWords === 0 ||
        (sumWordChars >= nWords * 3 && sumWordChars <= nWords * 10))
        .as("r_mean_word_len"),
      (nWords === 0 || (hashes + ellipses) * 10 <= nWords).as("r_symbol_ratio"),
      (nWords === 0 || alphaWords * 10 >= nWords * 8).as("r_alpha_words"),
      (nLines === 0 || bulletLines * 10 <= nLines).as("r_bullet_lines"),
      (nLines === 0 || ellipsisLines * 10 <= nLines * 3).as("r_ellipsis_lines"),
      (distinctStops >= 2).as("r_stopwords"),
      (!lower(t).contains("lorem ipsum")).as("r_no_lorem"),
      (!t.contains("{")).as("r_no_brace")): _*)
      .withColumn("pass",
        col("r_word_count") && col("r_mean_word_len") && col("r_symbol_ratio") &&
          col("r_alpha_words") && col("r_bullet_lines") && col("r_ellipsis_lines") &&
          col("r_stopwords") && col("r_no_lorem") && col("r_no_brace"))
  }
}
