package graft

import org.apache.spark.sql.functions._
import graft.functions._

/** Unit cases for the pure column functions — the reference's own
  * parser case tables ported from
  * /root/reference/utils/importer/test_etl.py:22-69 (incl the
  * Chinese-text cases) plus engine-specific edges.
  */
class FunctionsSpec extends SparkSpec {

  // test_parse_array cases (test_etl.py:24-31)
  test("extractUrls: bracketed two-url array") {
    assert(eval(size(extractUrls(
      lit("[https://example.com/1.jpg, https://example.com/2.jpg]")))) == 2)
  }
  test("extractUrls: bare single url") {
    assert(eval(size(extractUrls(lit("https://example.com/single.jpg")))) == 1)
  }
  test("extractUrls: empty and null and non-url input give empty") {
    assert(eval(size(extractUrls(lit("")))) == 0)
    assert(eval(size(extractUrls(lit(null).cast("string")))) == 0)
    assert(eval(size(extractUrls(lit("123")))) == 0)
  }
  test("extractUrls: url values are exact") {
    assert(eval(array_join(extractUrls(
      lit("[https://example.com/1.jpg, https://example.com/2.jpg]")), "|"))
      == "https://example.com/1.jpg|https://example.com/2.jpg")
  }

  // test_parse_attributes cases (test_etl.py:41-47)
  test("attributePairs: Chinese 3-pair string") {
    val c = attributePairs(
      lit("品牌:NEXTUXURY AVENUE/丽舍大道-外套材质:混纺-图案:几何图案"))
    assert(eval(size(c)) == 3)
    assert(eval(element_at(c, 1).getField("attr_key")) == "品牌")
    assert(eval(element_at(c, 1).getField("attr_value"))
      == "NEXTUXURY AVENUE/丽舍大道")
    assert(eval(element_at(c, 2).getField("attr_key")) == "外套材质")
    assert(eval(element_at(c, 3).getField("attr_value")) == "几何图案")
  }
  test("attributePairs: single pair") {
    assert(eval(size(attributePairs(lit("key1:value1")))) == 1)
  }
  test("attributePairs: semicolon-separated pairs") {
    assert(eval(size(attributePairs(lit("key1:value1;key2:value2")))) == 2)
  }
  test("attributePairs: empty / null / no-colon give empty") {
    assert(eval(size(attributePairs(lit("")))) == 0)
    assert(eval(size(attributePairs(lit(null).cast("string")))) == 0)
    assert(eval(size(attributePairs(lit("123")))) == 0)
  }
  test("attributePairs: value keeps colons after the first") {
    val c = attributePairs(lit("url:https://x/a"))
    assert(eval(element_at(c, 1).getField("attr_value")) == "https://x/a")
  }

  // test_clean_string cases (test_etl.py:58-63)
  test("cleanString: trims, keeps empty, keeps null") {
    assert(eval(cleanString(lit("  test  "))) == "test")
    assert(eval(cleanString(lit("test"))) == "test")
    assert(eval(cleanString(lit(""))) == "")
    assert(eval(cleanString(lit(null).cast("string"))) == null)
  }

  // F7: the rstrip('.0') char-class bug is deliberately NOT replicated
  test("stripDotZero: exact suffix only") {
    assert(eval(stripDotZero(lit("M1-A.0"))) == "M1-A")
    assert(eval(stripDotZero(lit("M1-A0"))) == "M1-A0")
    assert(eval(stripDotZero(lit("x.00"))) == "x.00")
    assert(eval(stripDotZero(lit("10.0"))) == "10")
  }

  test("fixDecimalComma: thousands spaces + decimal comma") {
    assert(eval(fixDecimalComma(lit("1 299,50"))) == 1299.5)
    assert(eval(fixDecimalComma(lit("899,99"))) == 899.99)
    assert(eval(fixDecimalComma(lit(""))) == null)
  }

  test("sanitizeFilename: forbidden chars and length cap") {
    assert(eval(sanitizeFilename(lit("""a/b:c*?"<>|.txt""")))
      == "a_b_c______.txt")
    assert(eval(length(sanitizeFilename(lit("x" * 300)))) == 100)
  }

  test("cleanImgArray: strips cruft, keeps only http(s)") {
    val arr = array(lit("[\"http://a/1"), lit("junk"),
      lit("\"https://b/2\"]"), lit("'http://c/3'"))
    assert(eval(array_join(cleanImgArray(arr), "|"))
      == "http://a/1|https://b/2|http://c/3")
  }

  test("extractImgSrcs: both quote styles") {
    assert(eval(array_join(extractImgSrcs(
      lit("""<img src="http://a/1.jpg"><img alt="x" src='https://b/2'>""")),
      "|")) == "http://a/1.jpg|https://b/2")
  }

  test("deterministicId: uuid-shaped, stable, key-sensitive") {
    val a = eval(deterministicId(lit("pc"), lit("M001"))).toString
    val b = eval(deterministicId(lit("pc"), lit("M001"))).toString
    val c = eval(deterministicId(lit("pc"), lit("M002"))).toString
    assert(a == b)
    assert(a != c)
    assert(a.matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"))
  }

  test("tokens/normalizeText: punctuation to spaces, collapse, trim") {
    assert(eval(array_join(tokens(lit("  Héllo,  WORLD!x  ")), "|"))
      == "héllo|world|x")
    assert(eval(size(tokens(lit("...")))) == 0)
    assert(eval(size(tokens(lit(null).cast("string")))) == 0)
  }

  test("shingles: n-grams over tokens") {
    assert(eval(array_join(shingles(lit("a b c d"), 2), "|"))
      == "a b|b c|c d")
    assert(eval(size(shingles(lit("a b"), 3))) == 0)
  }

  test("dotProduct / cosineSimilarity: ordered fold") {
    val a = array(lit(1.0f), lit(2.0f), lit(3.0f))
    val b = array(lit(4.0f), lit(5.0f), lit(6.0f))
    assert(eval(dotProduct(a, b)) == 32.0)
    val cos = eval(cosineSimilarity(a, a)).asInstanceOf[Double]
    assert(math.abs(cos - 1.0) < 1e-12)
  }

  test("hashBucket: stable, in-range, salt-decorrelated") {
    val b1 = eval(hashBucket(lit(42), 100)).asInstanceOf[Long]
    assert(b1 == eval(hashBucket(lit(42), 100)).asInstanceOf[Long])
    assert(b1 >= 0 && b1 < 100)
    // different salts give independent assignments for at least one key
    val diff = (0 until 20).exists { i =>
      eval(hashBucket(lit(i), 100)) != eval(hashBucket(lit(i), 100, "other"))
    }
    assert(diff)
  }

  test("redactPii: emails, urls, digit runs; order preserves urls") {
    assert(eval(redactPii(lit("mail a.b+c@ex-1.example.org now")))
      == "mail [EMAIL] now")
    assert(eval(redactPii(lit("see https://ex.com/p?id=12345678 ok")))
      == "see [URL] ok")
    assert(eval(redactPii(lit("call 12345678 not 123456")))
      == "call [NUM] not 123456")
    assert(eval(redactPii(lit("x user5@ex.org https://a.b/12345678 99999990")))
      == "x [EMAIL] [URL] [NUM]")
  }

  test("weightedPriority: weight-bounded, zero-safe, deterministic") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i.toLong, i.toLong))
      .toDF("k", "w")
      .select(col("k"), col("w"),
        weightedPriority(col("k"), col("w")).as("p"))
    val rows = df.as[(Long, Long, Long)].collect()
    // u in [1, 65536] => priority in [w, w*65536]; exact at both ends
    assert(rows.forall { case (_, w, p) => p >= w && p <= w * 65536L })
    assert(eval(weightedPriority(lit(7), lit(0))) == 0L)
    // same key+weight => same priority on a re-run (no rand anywhere)
    val again = (1 to 200).map(i => (i.toLong, i.toLong))
      .toDF("k", "w")
      .select(col("k"), col("w"),
        weightedPriority(col("k"), col("w")).as("p"))
    assertSameRows(df, again)
  }

  test("canonicalUrl: default ports, case, tracking params, fragments") {
    // scheme+host lowercase, :80 dropped for http, params sorted
    assert(eval(canonicalUrl(lit(
      "HTTP://Example.COM:80/a/Path?b=2&a=1"))) ==
      "http://example.com/a/Path?a=1&b=2")
    // :443 dropped for https, tracking params stripped, fragment cut
    assert(eval(canonicalUrl(lit(
      "https://Shop.Example.com:443/p/1?utm_source=mail&id=9&fbclid=x#top"))) ==
      "https://shop.example.com/p/1?id=9")
    // trailing slashes trimmed (incl multiple)
    assert(eval(canonicalUrl(lit("https://example.com/p/7//"))) ==
      "https://example.com/p/7")
    // non-default port survives; non-http(s) scheme keeps its port
    assert(eval(canonicalUrl(lit("https://example.com:8443/x"))) ==
      "https://example.com:8443/x")
    assert(eval(canonicalUrl(lit("ftp://Files.example.com:21/x"))) ==
      "ftp://files.example.com:21/x")
    // all params tracking => no '?' at all
    assert(eval(canonicalUrl(lit(
      "https://example.com/q?utm_campaign=x&utm_medium=y"))) ==
      "https://example.com/q")
    // 'ref' is stripped only as a whole param name: referrer= stays
    assert(eval(canonicalUrl(lit("https://e.com/a?ref=1&referrer=2"))) ==
      "https://e.com/a?referrer=2")
    // non-URLs pass through trimmed; null => empty
    assert(eval(canonicalUrl(lit("  not a url 42 "))) == "not a url 42")
    assert(eval(canonicalUrl(lit(null).cast("string"))) == "")
  }

  test("domainOf: host-level domain, www/userinfo/port stripped") {
    assert(eval(domainOf(lit("https://www.Site3.Example.com/p/1"))) ==
      "site3.example.com")
    assert(eval(domainOf(lit("http://site3.example.com:80/q"))) ==
      "site3.example.com")
    assert(eval(domainOf(lit("https://u:p@Site3.example.com:8443/r"))) ==
      "site3.example.com")
    // only a LEADING www. label is stripped
    assert(eval(domainOf(lit("https://www.www.example.com/"))) ==
      "www.example.com")
    assert(eval(domainOf(lit("https://wwwx.example.com/"))) ==
      "wwwx.example.com")
    // non-URLs and null land in the '' bucket
    assert(eval(domainOf(lit("doc 42"))) == "")
    assert(eval(domainOf(lit(null).cast("string"))) == "")
  }

  test("pseudonymize: deterministic, key-sensitive, distinct-preserving, " +
      "null-safe") {
    import spark.implicits._
    val key = lit("corpus-key-2026")
    // determinism + key sensitivity
    assert(eval(pseudonymize(key, lit("alice@example.com"))) ==
      eval(pseudonymize(key, lit("alice@example.com"))))
    assert(eval(pseudonymize(key, lit("alice@example.com"))) !=
      eval(pseudonymize(lit("other-key"), lit("alice@example.com"))))
    assert(eval(pseudonymize(key, lit("alice@example.com"))) !=
      eval(pseudonymize(key, lit("bob@example.com"))))
    // 64 lowercase hex chars
    val tok = eval(pseudonymize(key, lit("x"))).asInstanceOf[String]
    assert(tok.length == 64 && tok.forall("0123456789abcdef".contains(_)))
    // join preservation: tokenizing a column keeps its distinct count
    val df = (1 to 200).map(i => s"user${i % 37}@ex.org").toDF("email")
    val n = df.select(countDistinct(pseudonymize(key, col("email"))),
      countDistinct(col("email"))).as[(Long, Long)].head()
    assert(n._1 == n._2 && n._1 == 37L, n)
    assert(eval(pseudonymize(key, lit(null).cast("string"))) == null)
  }

  test("luhnValid: canonical check digits pass, neighbors fail, " +
      "non-digit/empty/null are false (never null)") {
    // the canonical Luhn example and its off-by-one neighbor
    assert(eval(luhnValid(lit("79927398713"))) == true)
    assert(eval(luhnValid(lit("79927398714"))) == false)
    // a well-known test PAN (repeating 42s) validates
    assert(eval(luhnValid(lit("4242424242424242"))) == true)
    // separators/letters disqualify rather than nulling out
    assert(eval(luhnValid(lit("4242 4242 4242 4242"))) == false)
    assert(eval(luhnValid(lit("4539x0000000"))) == false)
    assert(eval(luhnValid(lit(""))) == false)
    assert(eval(luhnValid(lit(null).cast("string"))) == false)
  }

  test("nfcNormalize: composes decomposed sequences, NFC-only, null-safe") {
    // e + combining acute (U+0301) composes to U+00E9
    assert(eval(nfcNormalize(lit("Café"))) == "Café")
    // already-composed input is identity (idempotence base case)
    assert(eval(nfcNormalize(lit("Café"))) == "Café")
    // decomposed Hangul Jamo compose to the syllable block
    assert(eval(nfcNormalize(lit("가"))) == "가")
    // ASCII fast path is identity
    assert(eval(nfcNormalize(lit("plain ascii 42"))) == "plain ascii 42")
    // NFC must NOT apply compatibility mappings (fullwidth A stays —
    // that would be NFKC, a different contract)
    assert(eval(nfcNormalize(lit("Ａ"))) == "Ａ")
    assert(eval(nfcNormalize(lit(null).cast("string"))) == null)
  }
}
