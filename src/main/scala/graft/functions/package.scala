package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure column functions of the engine — the scalar/collection surface
  * of SURVEY.md §2.7/§2.8, re-expressed as codegen-friendly Catalyst
  * built-in compositions (no UDFs in the hot path).
  *
  * Reference semantics studied at (all paths under /root/reference/):
  *  - parse_attributes: utils/importer/ETL.py:67-83
  *  - parse_custom_attributes: utils/custom_attributes_parser.py:14-23
  *  - parse_array (URL extraction): utils/importer/ETL.py:58-65
  *  - clean_string: utils/importer/ETL.py:40-44
  *  - img-array cleaning: utils/product_collection_img_array_processor.py:30-52
  *  - <img src> extraction: utils/details_translator/db_orchestrator.py:65-68
  *  - decimal comma fix: utils/importer/ETL.py:503-504
  *  - '.0' SKU suffix strip: utils/fix_sku_dot_zero.py:128 (intended
  *    exact-suffix semantics; the reference's rstrip('.0') char-class
  *    bug is deliberately NOT replicated)
  *  - filename sanitization: utils/html_to_pdf/html_to_pdf_printer.py:18-19
  */
package object functions {

  /** Mersenne-ish prime used for 31-bit hash folding (fits all
    * intermediate products in a signed 64-bit without overflow). */
  val HashPrime31: Long = 2147483647L

  /** clean_string: trim, identity on null. */
  def cleanString(c: Column): Column = trim(c)

  /** Deterministic id from natural-key columns — substitute for the
    * reference's uuid4 (utils/importer/ETL.py:36-38) so results are
    * oracle-hashable. sha256 of the '|'-joined key, formatted as a
    * 36-char uuid-shaped string. */
  def deterministicId(cols: Column*): Column = {
    val h = sha2(concat_ws("|", cols: _*), 256)
    concat_ws(
      "-",
      substring(h, 1, 8),
      substring(h, 9, 4),
      substring(h, 13, 4),
      substring(h, 17, 4),
      substring(h, 21, 12))
  }

  /** Stable 60-bit non-negative hash of a string: first 15 hex chars of
    * md5, base-16 decoded. Reproducible in any engine with md5. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Second independent 60-bit hash from the SAME md5 digest as
    * [[hash60]] (hex digits 16-30 of the 32-digit md5): a
    * double-hashing scheme (Kirsch-Mitzenmacher bloom positions)
    * needs two independent hashes, and deriving both from one digest
    * halves the per-row md5 work on a fact-table scan — codegen
    * subexpression elimination evaluates the shared md5 once. */
  def hash60b(c: Column): Column =
    conv(substring(md5(c), 16, 15), 16, 10).cast("long")

  /** Stable 31-bit non-negative hash (mod 2^31-1); safe to combine
    * linearly (a*h+b) inside 64-bit arithmetic. */
  def hash31(c: Column): Column = hash60(c) % HashPrime31

  /** Driver-side mirror of [[hash31]] for Scala string literals —
    * used to derive hash-family constants that must be identical in
    * the Spark expression and the SQL oracle. */
  def hash31Lit(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16) % HashPrime31
  }

  /** parse_attributes — 'k1:v1-k2:v2;k3:v3' → array<struct<attr_key,
    * attr_value>>. Split on '-', then ';', keep segments containing
    * ':', split on the FIRST ':' only, trim both sides. */
  def attributePairs(raw: Column): Column = {
    val segments = flatten(
      transform(split(coalesce(raw, lit("")), "-"), s => split(s, ";")))
    val withColon = filter(segments, s => instr(s, ":") > 0)
    transform(
      withColon,
      s => {
        val kv = split(s, ":", 2)
        struct(
          trim(element_at(kv, 1)).as("attr_key"),
          trim(element_at(kv, 2)).as("attr_value"))
      })
  }

  /** parse_array — any string → array of http(s) URLs it contains. */
  def extractUrls(c: Column): Column =
    coalesce(
      regexp_extract_all(c, lit("""https?://[^\s,\]]+"""), lit(0)),
      array())

  /** img-array cleaning: strip brace/quote cruft per element, keep only
    * http(s) members. */
  def cleanImgArray(arr: Column): Column =
    filter(
      transform(coalesce(arr, array()),
        x => regexp_replace(trim(x), """^["\[\]']+|["\[\]']+$""", "")),
      x => x.startsWith("http://") || x.startsWith("https://"))

  /** <img src="..."> extraction from an HTML string. */
  def extractImgSrcs(html: Column): Column =
    coalesce(
      regexp_extract_all(html,
        lit("""<img[^>]*src=["']([^"']+)["']"""), lit(1)),
      array())

  /** Explicit whitespace class, identical in Java regex and RE2:
    * `\s` differs between the engines (Java's includes \x0B vertical
    * tab, RE2's is [ \t\n\f\r]), so every pattern shared with a
    * DuckDB/RE2 oracle spells the set out. */
  val WsClass: String = """[ \t\n\x0B\f\r]"""

  /** European decimal-comma numeric string → DoubleType
    * ("1 234,56" → 1234.56). */
  def fixDecimalComma(c: Column): Column = {
    // null (not ANSI cast failure) for malformed/empty input - Spark 4
    // runs ANSI mode by default; a dirty row must not kill a 100 TB load
    val cleaned = regexp_replace(regexp_replace(c, WsClass, ""), ",", ".")
    when(cleaned.rlike("^-?[0-9]+(\\.[0-9]+)?$"), cleaned.cast("double"))
  }

  /** Exact-suffix '.0' strip (NOT char-class rstrip). */
  def stripDotZero(c: Column): Column =
    regexp_replace(c, """\.0$""", "")

  /** Filename sanitization: forbidden chars → '_', cap at 100 chars. */
  def sanitizeFilename(c: Column): Column =
    substring(regexp_replace(c, """[\\/*?:"<>|]""", "_"), 1, 100)

  /** Deterministic hash bucket in [0, buckets) for sampling and
    * sharding: md5-derived, so a 1% sample is the SAME 1% on every
    * engine, every run, at every scale — the property that makes
    * corpus subsets reproducible. The salt keeps independent samples
    * decorrelated. */
  def hashBucket(c: Column, buckets: Int, salt: String = "samp"): Column =
    hash31(concat(lit(s"$salt:"), c.cast("string"))) % buckets

  /** Deterministic weighted-priority sampling key (priority
    * sampling, Duffield et al.): priority = w * 65536 div u with u an
    * md5-derived uniform in [1, 65536] — taking the global top-k by
    * priority is a weight-biased sample with NO rand() anywhere, so
    * the same sample reproduces on every engine, run, and retry.
    * Integer-valued throughout: u ≤ 2^16 and w*65536 < 2^53 keep
    * floor(a/b) exactly equal to integer division (the double
    * quotient's ulp is far below the 1/65536 gap to the nearest
    * integer), so an integer-division oracle matches bit-for-bit. */
  def weightedPriority(key: Column, weight: Column,
      salt: String = "wsamp"): Column =
    floor(
      (weight.cast("long") * lit(65536L))
        / (hash31(concat(lit(s"$salt:"), key.cast("string"))) % 65536L
          + lit(1L))).cast("long")

  /** PII redaction for training-data hygiene: emails → [EMAIL],
    * URLs → [URL], long digit runs (7+, phone/account-shaped) →
    * [NUM]. Order matters — URLs are redacted before digit runs so a
    * URL's digits don't shred it. Patterns are RE2-compatible (no
    * backreferences/lookahead) so the DuckDB oracle replays them
    * byte-identically. */
  def redactPii(c: Column): Column = {
    val email = """[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"""
    val url = """https?://[^\s]+"""
    val num = """[0-9]{7,}"""
    regexp_replace(
      regexp_replace(
        regexp_replace(c, email, "[EMAIL]"),
        url, "[URL]"),
      num, "[NUM]")
  }

  /** Query-string parameter names that never identify content —
    * tracking/campaign cruft stripped during URL canonicalization.
    * RE2-compatible alternation (anchored per-param below) so the
    * DuckDB oracle replays it byte-identically. */
  val TrackingParams: String =
    "utm_[a-z]*|gclid|fbclid|msclkid|mc_cid|mc_eid|ref|igshid"

  /** Canonical form of a URL for web-corpus deduplication (the
    * normalize step every crawl pipeline runs before URL-level
    * dedup): lowercase scheme and host, drop the default port
    * (:80 http / :443 https), drop the #fragment, drop tracking
    * params ([[TrackingParams]]), sort surviving query params
    * byte-wise, and strip trailing slashes from the path. A string
    * with no scheme://host shape passes through trimmed (caller
    * decides whether to quarantine). Pure regexp/array expressions —
    * whole-stage codegen, zero shuffle, and an exact DuckDB mirror
    * (`sqlCanonicalUrl`). */
  def canonicalUrl(c: Column): Column = {
    val u = trim(coalesce(c, lit("")))
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostRaw = lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = when(scheme === "http", regexp_replace(hostRaw, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostRaw, ":443$", ""))
      .otherwise(hostRaw)
    val path = regexp_replace(
      regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/+$", "")
    val query = regexp_extract(u, """\?([^#]*)""", 1)
    val params = filter(split(query, "&"), p =>
      p =!= "" && !p.rlike(s"^($TrackingParams)="))
    val q2 = array_join(array_sort(params), "&")
    when(scheme === "", u).otherwise(
      concat(scheme, lit("://"), host, path,
        when(q2 === "", "").otherwise(concat(lit("?"), q2))))
  }

  /** Host-level domain of a URL for domain-level curation (the
    * grouping key of domain blocklists and per-site quality stats):
    * the lowercased authority with any userinfo, port, and one
    * leading "www." stripped. Empty string for non-URLs.
    * Registrable-domain (public-suffix) folding is deliberately NOT
    * attempted — the suffix list is an external, versioned artifact;
    * host-level grouping is the deterministic dependency-free unit,
    * and a suffix table can always be joined on top. Pure regexp —
    * codegen, zero shuffle, exact DuckDB mirror (`sqlDomainOf`). */
  def domainOf(c: Column): Column = {
    val host = lower(regexp_extract(trim(coalesce(c, lit(""))),
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)", 1))
    regexp_replace(host, "^www\\.", "")
  }

  // ----- text-analysis primitives (LLM-pipeline surface) -----

  /** Lowercase, strip punctuation to spaces, collapse whitespace. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(coalesce(c, lit(""))),
        """[^\p{L}\p{N} \t\n\x0B\f\r]""", " "),
      """[ \t\n\x0B\f\r]+""", " "))

  /** Whitespace tokens of normalized text (empty array for blank). */
  def tokens(c: Column): Column = {
    val n = normalizeText(c)
    when(n === "", array()).otherwise(split(n, " "))
  }

  /** Word n-gram shingles, space-joined. */
  def shingles(c: Column, n: Int): Column = {
    val t = tokens(c)
    when(size(t) < n, array()).otherwise(
      transform(sequence(lit(0), size(t) - n),
        i => array_join(slice(t, i + 1, lit(n)), " ")))
  }

  /** Polynomial rolling hash over the token stream (order-sensitive
    * document fingerprint): fold (acc*31 + hash31(tok)) mod (2^31-1). */
  def rollingFingerprint(c: Column): Column =
    aggregate(
      tokens(c),
      lit(0L),
      (acc, t) => (acc * 31L + hash31(t)) % HashPrime31)

  // ----- vector primitives (shared by Similarity/Dedup) -----

  /** Dot product of two numeric arrays via an ORDERED left fold —
    * element order is the summation order, so the resulting double is
    * bit-identical across engines that fold sequentially. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Native-Expression dot product (graft.expressions.DotProductFloat
    * via the graft_dot function registered by plans.GraftExtensions):
    * same left-to-right summation, but a codegen'd tight loop instead
    * of an interpreted HOF fold. Requires the session to be built
    * with spark.sql.extensions=graft.plans.GraftExtensions. */
  def dotProductNative(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** Cosine over the native dot product — bit-identical to
    * [[cosineSimilarity]] (same fold order), ~frees the hot loop from
    * interpretation at 100 TB. */
  def cosineSimilarityNative(a: Column, b: Column): Column =
    dotProductNative(a, b) /
      (sqrt(dotProductNative(a, a)) * sqrt(dotProductNative(b, b)))

  /** Cosine similarity in double precision with ordered folds. */
  def cosineSimilarity(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** Luhn check-digit validation (ISO/IEC 7812) of a digits-only
    * string: from the RIGHTMOST digit, every second digit doubles
    * (minus 9 on overflow) and the total must divide by 10 — the
    * checksum payment-card numbers carry. The PII pipeline's
    * precision filter: a 16-digit order id fails Luhn ~90% of the
    * time, so gating card redaction on it cuts false positives an
    * order of magnitude. Non-digit, empty, and null inputs are
    * false (not null): a non-candidate is a non-match. Pure per-row
    * integer fold — codegen'd, engine-reproducible. */
  def luhnValid(c: Column): Column = {
    val n = length(c)
    val digitsOnly = c.rlike("^[0-9]+$")
    val total = aggregate(
      sequence(lit(1), n), lit(0L),
      (acc, i) => {
        val d = (ascii(c.substr(i, lit(1))) - 48).cast("long")
        val term = when(((n - i) % 2) === 0, d)
          .otherwise(when(d * 2 > 9, d * 2 - 9).otherwise(d * 2))
        acc + term
      })
    coalesce(when(digitsOnly, total % 10 === 0), lit(false))
  }

  /** Keyed pseudonymization: HMAC-SHA256 of a string column under a
    * secret string key, as lowercase hex (native graft_hmac_sha256).
    * Same value → same token (joins keep working across tables);
    * RFC 2104 HMAC, so no length-extension forgery and no un-keyed
    * rainbow table. Requires GraftExtensions. */
  def pseudonymize(key: Column, c: Column): Column =
    call_function("graft_hmac_sha256",
      encode(key, "UTF-8"), encode(c, "UTF-8"))

  /** Unicode NFC normalization (native graft_nfc expression) — the
    * canonicalization exact-dedup keys need on crawl text, where the
    * same accented string arrives precomposed and decomposed and
    * byte-equality misses the duplicate. Requires the session to be
    * built with spark.sql.extensions=graft.plans.GraftExtensions. */
  def nfcNormalize(c: Column): Column = call_function("graft_nfc", c)
}
