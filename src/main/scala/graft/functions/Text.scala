package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the MapReduce-surface and text-analysis
  * operators. Pure `functions._` compositions (whole-stage codegen) —
  * no Scala UDFs in the hot path.
  *
  * Tokenizer semantics follow the reference
  * (/root/reference/mapreduce/worker/algorithm.py:10-12): split on one
  * or more ASCII-punctuation-or-whitespace chars, drop empty tokens.
  * Java `\p{Punct}` == Python `string.punctuation` == RE2
  * `[[:punct:]]` (same 32 ASCII chars), so the DuckDB oracle regex
  * `[[:punct:][:space:]]+` is semantically identical.
  */
object Text {
  val TokenSplitRegex = "[\\p{Punct}\\s]+"

  /** Array of non-empty tokens of `c` (reference map_function semantics). */
  def tokens(c: Column): Column =
    filter(split(c, TokenSplitRegex), t => length(t) > 0)

  /** Whitespace-separated token count (fast path, no explode). */
  def wsTokenCount(c: Column): Column =
    size(filter(split(c, "\\s+"), t => length(t) > 0))

  /** BPE-ish token count: word pieces + digits + single punct marks,
    * the usual `~chars/4` proxy a training pipeline meters with.
    */
  val BpeIshRegex = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeIshTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpeIshRegex), lit(0)))

  /** Lowercased, whitespace-collapsed, trimmed text — canonical form
    * used by dedup and fingerprinting.
    */
  def normalized(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Unicode-aware tokenizer twin: tokens are maximal runs of Unicode
    * letters/digits (`\p{L}\p{N}`), so accented Latin, CJK, and
    * non-ASCII digits tokenize as words instead of being split on as
    * "punctuation" the way the ASCII reference tokenizer (`tokens`,
    * pinned to the reference semantics — do NOT change it) would.
    * `regexp_extract_all` rather than split: no empty-fragment edge
    * at delimiters. UnicodeTokensSpec pins the non-ASCII behavior;
    * the `txt_token_count_unicode` oracle pins cross-engine parity.
    */
  val UnicodeTokenRegex = "[\\p{L}\\p{N}]+"
  def unicodeTokens(c: Column): Column =
    regexp_extract_all(c, lit(UnicodeTokenRegex), lit(0))

  /** Corpus-wide tokenizer selector: set the Spark conf
    * `graft.tokenizer=unicode` to route every txt_ operator that
    * tokenizes via `tokens` (TextAnalysis.docTokens wires the conf)
    * through the Unicode twin; default (or `ascii`) keeps the
    * reference-conformant ASCII split. The wc_/dd_ families and the
    * native ShingleHashes/NGrams expressions stay pinned ASCII —
    * those are reference/oracle-conformance surfaces, not
    * multilingual ones.
    */
  def tokensFor(mode: String)(c: Column): Column = mode match {
    case "unicode" => unicodeTokens(c)
    case _         => tokens(c)
  }

  /** Ratio of ASCII punctuation chars to total chars. */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(
        (length(c) - length(regexp_replace(c, "\\p{Punct}", ""))).cast("double") /
          length(c).cast("double"))

  /** Polynomial rolling hash over the chars of `c` (base 131 mod
    * 1e9+7), as a codegen'd higher-order-function fold — a
    * Rabin-Karp-style document fingerprint. Modular form keeps every
    * intermediate < 2^62 so it is ANSI-safe (no wrapping multiply,
    * which Spark 4's ANSI mode rejects).
    */
  def rollingHash(c: Column): Column =
    aggregate(
      // split("") yields empty-string fragments on some engines; keep 1-char tokens only.
      filter(split(c, ""), s => length(s) === 1),
      lit(0L),
      (acc, ch) => pmod(acc * lit(131L) + ascii(ch).cast("long"), lit(1000000007L)))
}
