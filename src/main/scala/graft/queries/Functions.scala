package graft.queries

import org.apache.spark.sql.functions._
import graft.functions._

/** The scalar/collection-function [Q] inventory (SURVEY.md §2.7) and
  * the explode/generator operators (§2.8), exercised over the
  * `documents` table with inputs synthesized from its columns — the
  * synthesis is replicated verbatim in the oracle SQL, so both engines
  * parse the exact same strings.
  */
object Functions {

  val all: Seq[Q] = Seq(

    // F1: clean_string (trim).
    Q("q_f1_clean_string",
      """SELECT doc_id, substr(trim(concat('  ', text, '  ')), 1, 30) AS cleaned
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          substring(cleanString(concat(lit("  "), col("text"), lit("  "))),
            1, 30).as("cleaned"))
        .orderBy("doc_id")
    },

    // F2+F3+G1: multi-level attribute split ('-' then ';', keep
    // segments with ':', split on FIRST ':' only) exploded to rows —
    // the reference's parse_attributes/parse_custom_attributes
    // (/root/reference/utils/importer/ETL.py:67-83,
    //  utils/custom_attributes_parser.py:14-23) incl a Chinese pair.
    Q("q_f3_g1_attribute_pairs",
      """WITH raw AS (
        |  SELECT doc_id, concat('brand:', source, ';size:', n_chars,
        |    '-color:', lang, ';品牌:华为-x') AS r
        |  FROM documents),
        |segs AS (
        |  SELECT doc_id,
        |    unnest(flatten(list_transform(string_split(r, '-'),
        |      s -> string_split(s, ';')))) AS seg
        |  FROM raw)
        |SELECT doc_id,
        |  trim(string_split(seg, ':')[1]) AS attr_key,
        |  trim(array_to_string(string_split(seg, ':')[2:], ':')) AS attr_value
        |FROM segs WHERE strpos(seg, ':') > 0
        |ORDER BY doc_id, attr_key, attr_value""".stripMargin) { (s, d) =>
      val raw = concat(lit("brand:"), col("source"), lit(";size:"),
        col("n_chars").cast("string"), lit("-color:"), col("lang"),
        lit(";品牌:华为-x"))
      t(s, d, "documents")
        .select(col("doc_id"), explode(attributePairs(raw)).as("p"))
        .select(col("doc_id"), col("p.attr_key"), col("p.attr_value"))
        .orderBy("doc_id", "attr_key", "attr_value")
    },

    // F4: regex extract-all URLs.
    Q("q_f4_extract_urls",
      raw"""SELECT doc_id,
           |  array_to_string(regexp_extract_all(
           |    concat('see http://ex.com/', doc_id, ' and [https://',
           |           source, '.io/x], end'),
           |    'https?://[^\s,\]]+', 0), ' ') AS urls
           |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val raw = concat(lit("see http://ex.com/"), col("doc_id").cast("string"),
        lit(" and [https://"), col("source"), lit(".io/x], end"))
      t(s, d, "documents")
        .select(col("doc_id"),
          array_join(extractUrls(raw), " ").as("urls"))
        .orderBy("doc_id")
    },

    // F5+F9: img-array cleaning (strip brace/quote cruft, keep http*).
    Q("q_f5_clean_img_array",
      raw"""SELECT doc_id, array_to_string(list_filter(list_transform(
           |    [concat('["http://img/', doc_id), 'junk',
           |     concat('"https://c/', lang, '"]'), '''http://q/'''],
           |    x -> regexp_replace(trim(x),
           |           '^["\[\]'']+|["\[\]'']+$$', '', 'g')),
           |    x -> x LIKE 'http://%' OR x LIKE 'https://%'), ' ') AS imgs
           |FROM documents ORDER BY doc_id""".stripMargin
        .replace("$$", "$")) { (s, d) =>
      val arr = array(
        concat(lit("[\"http://img/"), col("doc_id").cast("string")),
        lit("junk"),
        concat(lit("\"https://c/"), col("lang"), lit("\"]")),
        lit("'http://q/'"))
      t(s, d, "documents")
        .select(col("doc_id"),
          array_join(cleanImgArray(arr), " ").as("imgs"))
        .orderBy("doc_id")
    },

    // F6: decimal-comma numeric normalization.
    Q("q_f6_decimal_comma",
      raw"""SELECT doc_id,
           |  CAST(replace(regexp_replace(
           |    concat('1 2', (doc_id % 90) + 10, ',', doc_id % 10),
           |    '[ \t\n\x0B\f\r]', '', 'g'), ',', '.') AS DOUBLE) AS price
           |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val sCol = concat(lit("1 2"), ((col("doc_id") % 90) + 10).cast("string"),
        lit(","), (col("doc_id") % 10).cast("string"))
      t(s, d, "documents")
        .select(col("doc_id"), fixDecimalComma(sCol).as("price"))
        .orderBy("doc_id")
    },

    // F7: exact-suffix '.0' strip (NOT the reference's rstrip
    // char-class bug — documented deviation).
    Q("q_f7_strip_dot_zero",
      raw"""SELECT doc_id,
           |  regexp_replace(concat('SKU', doc_id,
           |    CASE WHEN doc_id % 2 = 0 THEN '.0' ELSE '' END),
           |    '\.0$$', '') AS sku
           |FROM documents ORDER BY doc_id""".stripMargin.replace("$$", "$")) { (s, d) =>
      val sku = concat(lit("SKU"), col("doc_id").cast("string"),
        when(col("doc_id") % 2 === 0, ".0").otherwise(""))
      t(s, d, "documents")
        .select(col("doc_id"), stripDotZero(sku).as("sku"))
        .orderBy("doc_id")
    },

    // F8: filename sanitization.
    Q("q_f8_sanitize_filename",
      """SELECT doc_id,
        |  substr(regexp_replace(
        |    concat('a/b:', source, '*?"x<', lang, '>.txt'),
        |    '[\\/*?:"<>|]', '_', 'g'), 1, 100) AS fname
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val name = concat(lit("a/b:"), col("source"), lit("*?\"x<"),
        col("lang"), lit(">.txt"))
      t(s, d, "documents")
        .select(col("doc_id"), sanitizeFilename(name).as("fname"))
        .orderBy("doc_id")
    },

    // F10: split_part / substring_index tokenization.
    Q("q_f10_split_part",
      """SELECT doc_id, split_part(text, ' ', 2) AS second_tok,
        |  array_to_string((string_split(text, ' '))[1:3], ' ') AS first3
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          split_part(col("text"), lit(" "), lit(2)).as("second_tok"),
          substring_index(col("text"), " ", 3).as("first3"))
        .orderBy("doc_id")
    },

    // F11: casts & null normalization.
    Q("q_f11_casts",
      """SELECT doc_id, CAST(CAST(n_chars AS VARCHAR) AS BIGINT) AS n2,
        |  coalesce(NULLIF(lang, 'en'), '') AS lang_nz
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          col("n_chars").cast("string").cast("long").as("n2"),
          coalesce(nullif(col("lang"), lit("en")), lit("")).as("lang_nz"))
        .orderBy("doc_id")
    },

    // F12: deterministic uuid-shaped id from natural keys.
    Q("q_f12_deterministic_id",
      s"""SELECT doc_id,
         |  ${sqlDetId("concat_ws('|', 'doc', doc_id, lang)")} AS det_id
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          deterministicId(lit("doc"), col("doc_id"), col("lang"))
            .as("det_id"))
        .orderBy("doc_id")
    },

    // F13: concat / printf-style formatting.
    Q("q_f13_concat_format",
      """SELECT doc_id, printf('%s_%04d', lang, doc_id % 1000) AS tag,
        |  concat_ws('-', lang, source) AS pair
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          format_string("%s_%04d", col("lang"), col("doc_id") % 1000)
            .as("tag"),
          concat_ws("-", col("lang"), col("source")).as("pair"))
        .orderBy("doc_id")
    },

    // F14: array length.
    Q("q_f14_array_len",
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_raw_tokens
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_raw_tokens"))
        .orderBy("doc_id")
    },

    // F15: timestamp + interval arithmetic, date_trunc.
    Q("q_f15_interval",
      """SELECT event_id, epoch_us(ts + INTERVAL 1 HOUR) AS ts_plus_h,
        |  epoch_us(date_trunc('day', ts)) AS day_us
        |FROM events WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
        |ORDER BY event_id LIMIT 2000""".stripMargin) { (s, d) =>
      events(s, d)
        .filter(col("ts") >= to_timestamp(lit("2024-01-02 00:00:00")))
        .select(col("event_id"),
          epochUs(col("ts") + expr("INTERVAL 1 HOUR")).as("ts_plus_h"),
          epochUs(date_trunc("day", col("ts"))).as("day_us"))
        .orderBy("event_id").limit(2000)
    },

    // F16: HTML <img src> extraction.
    Q("q_f16_img_src",
      """SELECT doc_id, array_to_string(regexp_extract_all(
        |    concat('<div><img src="http://i/', doc_id,
        |           '.jpg"><p>x</p><img src=''https://j/', lang,
        |           '''/></div>'),
        |    '<img[^>]*src=["'']([^"'']+)["'']', 1), ' ') AS srcs
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val html = concat(lit("<div><img src=\"http://i/"),
        col("doc_id").cast("string"),
        lit(".jpg\"><p>x</p><img src='https://j/"), col("lang"),
        lit("'/></div>"))
      t(s, d, "documents")
        .select(col("doc_id"),
          array_join(extractImgSrcs(html), " ").as("srcs"))
        .orderBy("doc_id")
    },

    // F17: head-n slice of an array.
    Q("q_f17_slice_head",
      """SELECT doc_id,
        |  array_to_string((string_split(text, ' '))[1:5], '|') AS head5
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          array_join(slice(split(col("text"), " "), 1, 5), "|").as("head5"))
        .orderBy("doc_id")
    },

    // G2: posexplode with per-group ordinal (0-based on both sides).
    Q("q_g2_posexplode",
      """SELECT doc_id,
        |  CAST(generate_subscripts(a, 1) - 1 AS BIGINT) AS pos,
        |  unnest(a) AS tok
        |FROM (SELECT doc_id, (string_split(text, ' '))[1:4] AS a
        |      FROM documents WHERE doc_id % 5 = 0)
        |ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"),
          posexplode(slice(split(col("text"), " "), 1, 4)))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("col").as("tok"))
        .orderBy("doc_id", "pos")
    },

    // G3: OCR-token rows — the stub OCR (U5) output exploded with
    // ordinals, the 2_ocr_from_images.py:51-62 shape.
    Q("q_g3_ocr_tokens",
      """SELECT doc_id,
        |  CAST(generate_subscripts(a, 1) - 1 AS BIGINT) AS ocr_index,
        |  unnest(a) AS token
        |FROM (SELECT doc_id, (string_split(text, ' '))[1:6] AS a
        |      FROM documents WHERE doc_id % 7 = 0)
        |ORDER BY doc_id, ocr_index""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"),
          posexplode(graft.operators.Services.ocrStub(col("text"), 6)))
        .select(col("doc_id"), col("pos").cast("long").as("ocr_index"),
          col("col").as("token"))
        .orderBy("doc_id", "ocr_index")
    },

    // G4: fixed-width field vector unpack (the 5-field logistics
    // extraction shape, db_orchestrator.py:135-137).
    Q("q_g4_struct_unpack",
      """SELECT doc_id,
        |  string_split(v, '|')[1] AS weight,
        |  string_split(v, '|')[2] AS dims,
        |  string_split(v, '|')[3] AS origin,
        |  string_split(v, '|')[4] AS hs_code,
        |  string_split(v, '|')[5] AS incoterm
        |FROM (SELECT doc_id, concat(n_chars % 50, 'kg|', n_chars % 9, 'x',
        |        n_chars % 7, '|', lang, '|HS', doc_id % 100, '|FOB') AS v
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val v = concat((col("n_chars") % 50).cast("string"), lit("kg|"),
        (col("n_chars") % 9).cast("string"), lit("x"),
        (col("n_chars") % 7).cast("string"), lit("|"), col("lang"),
        lit("|HS"), (col("doc_id") % 100).cast("string"), lit("|FOB"))
      val parts = split(v, "\\|")
      t(s, d, "documents")
        .select(col("doc_id"),
          element_at(parts, 1).as("weight"),
          element_at(parts, 2).as("dims"),
          element_at(parts, 3).as("origin"),
          element_at(parts, 4).as("hs_code"),
          element_at(parts, 5).as("incoterm"))
        .orderBy("doc_id")
    },

    // F20: URL canonicalization — the normalize-before-dedup step of
    // every web-corpus pipeline. Six synthesized shapes per corpus:
    // default ports dropped, host/scheme lowercased, tracking params
    // stripped, surviving params sorted, fragments cut, trailing
    // slashes trimmed, non-default ports and non-URLs passed through.
    Q("q_f20_url_canon",
      s"""SELECT doc_id, ${sqlCanonicalUrl("u")} AS curl
         |FROM (SELECT doc_id, CASE doc_id % 6
         |  WHEN 0 THEN concat('HTTP://Example.COM:80/a/', doc_id,
         |    '/?utm_source=mail&id=', doc_id)
         |  WHEN 1 THEN concat('https://Shop.Example.com:443/p/', doc_id,
         |    '?b=2&a=1&fbclid=xyz#top')
         |  WHEN 2 THEN concat('https://example.com/p/', doc_id, '/')
         |  WHEN 3 THEN 'ftp://Files.example.com:21/x'
         |  WHEN 4 THEN concat('not a url ', doc_id)
         |  ELSE 'https://example.com:443/q?utm_campaign=x&utm_medium=y'
         |  END AS u FROM documents)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val u = when(col("doc_id") % 6 === 0,
          concat(lit("HTTP://Example.COM:80/a/"), col("doc_id").cast("string"),
            lit("/?utm_source=mail&id="), col("doc_id").cast("string")))
        .when(col("doc_id") % 6 === 1,
          concat(lit("https://Shop.Example.com:443/p/"),
            col("doc_id").cast("string"), lit("?b=2&a=1&fbclid=xyz#top")))
        .when(col("doc_id") % 6 === 2,
          concat(lit("https://example.com/p/"), col("doc_id").cast("string"),
            lit("/")))
        .when(col("doc_id") % 6 === 3, lit("ftp://Files.example.com:21/x"))
        .when(col("doc_id") % 6 === 4,
          concat(lit("not a url "), col("doc_id").cast("string")))
        .otherwise(lit("https://example.com:443/q?utm_campaign=x&utm_medium=y"))
      t(s, d, "documents")
        .select(col("doc_id"), canonicalUrl(u).as("curl"))
        .orderBy("doc_id")
    },

    // F21: Unicode NFC normalization (native graft_nfc vs DuckDB's
    // nfc_normalize). The same accented word is synthesized both
    // precomposed (é = U+00E9) and decomposed (e + U+0301); distinct
    // counts collapse only after NFC, and the codepoint lengths
    // shrink — exact-dedup's missing canonicalization step on real
    // multilingual crawl text.
    Q("q_f21_nfc",
      """WITH m AS (SELECT CASE doc_id % 3
        |    WHEN 0 THEN concat('Caf', chr(233), ' bucket ', doc_id % 50)
        |    WHEN 1 THEN concat('Cafe', chr(769), ' bucket ', doc_id % 50)
        |    ELSE concat('plain bucket ', doc_id % 50) END AS s
        |  FROM documents)
        |SELECT CAST(count(DISTINCT s) AS BIGINT) AS raw_distinct,
        |  CAST(count(DISTINCT nfc_normalize(s)) AS BIGINT) AS nfc_distinct,
        |  CAST(sum(length(s)) AS BIGINT) AS raw_chars,
        |  CAST(sum(length(nfc_normalize(s))) AS BIGINT) AS nfc_chars
        |FROM m""".stripMargin) { (s, d) =>
      val v = when(col("doc_id") % 3 === 0,
          concat(lit("Caf\u00e9 bucket "),
            (col("doc_id") % 50).cast("string")))
        .when(col("doc_id") % 3 === 1,
          concat(lit("Cafe\u0301 bucket "),
            (col("doc_id") % 50).cast("string")))
        .otherwise(concat(lit("plain bucket "),
          (col("doc_id") % 50).cast("string")))
      t(s, d, "documents").select(v.as("s"))
        .agg(countDistinct(col("s")).as("raw_distinct"),
          countDistinct(nfcNormalize(col("s"))).as("nfc_distinct"),
          sum(length(col("s"))).cast("long").as("raw_chars"),
          sum(length(nfcNormalize(col("s")))).cast("long").as("nfc_chars"))
    })
}
