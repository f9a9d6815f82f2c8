"""Web-corpus extraction/cleaning stages (SURVEY.md §2.11 extension
family): HTML text extraction, unicode/whitespace normalization, and
registrable-domain (eTLD+1) per-domain caps.

These are the stages that run BEFORE the quality/dedup pipeline on a
web crawl (WET/WARC -> text): strip markup, canonicalize whitespace,
and bound any single domain's share of the corpus. The synthetic
documents table carries clean text, so — like `line_dedup_docs`'s
lined corpus — each operator runs over a corpus constructed
term-identically in Spark and the DuckDB oracle (markup wrapping /
deterministic dirtying / URL synthesis), which makes the extraction
logic itself the thing the value hash checks.

All pure Column expressions: zero Python rows, zero UDFs. Regexes are
written in the RE2∩Java subset (same discipline as `pii_scan`):
literal classes, lazy quantifiers, (?s) dotall — no lookaround, no
backrefs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text as tx
from ..util import portable_id_hash, widen_scan
from .registry import load, query

# ---------------------------------------------------------------------------
# Unicode / whitespace normalization
# ---------------------------------------------------------------------------

# Zero-width & BOM characters: deleted (they join words invisibly).
_RE_ZERO_WIDTH = r"[\x{200B}\x{200C}\x{200D}\x{FEFF}]"
# C0 controls except \t \n \r (those are whitespace, handled by \s+),
# DEL, and NBSP: replaced by a space. \x0B is included here because
# Java's \s contains it but RE2's does not — mapping it to ' ' before
# the \s+ collapse keeps both engines on identical behavior.
_RE_CONTROL = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F\x{00A0}]"


def normalize_ws_text(col: Column) -> Column:
    """Canonical text-cleaning stage: drop zero-width chars, map
    control chars + NBSP to spaces, collapse runs of whitespace,
    trim. Pure Column; identical semantics to sql_normalize_ws."""
    c = F.regexp_replace(col, _RE_ZERO_WIDTH, "")
    c = F.regexp_replace(c, _RE_CONTROL, " ")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def sql_normalize_ws(expr: str) -> str:
    """DuckDB mirror of normalize_ws_text (RE2 accepts the same
    \\x{{...}} classes; 'g' flag = replace-all like Spark)."""
    return (
        "trim(regexp_replace(regexp_replace(regexp_replace("
        f"{expr}, '{_RE_ZERO_WIDTH}', '', 'g'), "
        f"'{_RE_CONTROL}', ' ', 'g'), "
        "'\\s+', ' ', 'g'))"
    )


# Deterministic dirtying: four corruption modes chosen by doc_id % 4,
# plus universal leading/trailing junk. chr codes shared with the SQL.
_SQL_DIRTY_CORPUS = """
  SELECT doc_id,
         '  ' ||
         CASE doc_id % 4
           WHEN 0 THEN replace(text, ' ', chr(9))
           WHEN 1 THEN replace(text, ' ', '  ')
           WHEN 2 THEN replace(text, ' ', ' ' || chr(8203))
           ELSE chr(7) || replace(text, ' ', chr(160)) || chr(31)
         END || chr(9) AS dirty,
         text
  FROM documents
"""


def _dirty_corpus(docs: DataFrame) -> DataFrame:
    """(doc_id, dirty, text): text corrupted with tabs / double
    spaces / zero-width spaces / control chars + NBSP by doc_id % 4."""
    m = F.col("doc_id") % 4
    t = F.col("text")
    dirty = (
        F.when(m == 0, F.replace(t, F.lit(" "), F.lit("\t")))
        .when(m == 1, F.replace(t, F.lit(" "), F.lit("  ")))
        .when(m == 2, F.replace(t, F.lit(" "), F.lit(" \u200b")))
        .otherwise(
            F.concat(
                F.lit("\x07"),
                F.replace(t, F.lit(" "), F.lit("\u00a0")),
                F.lit("\x1f"),
            )
        )
    )
    return docs.select(
        "doc_id",
        F.concat(F.lit("  "), dirty, F.lit("\t")).alias("dirty"),
        "text",
    )


@query(
    "text_normalize_docs",
    oracle=f"""
    WITH dirty AS ({_SQL_DIRTY_CORPUS})
    SELECT doc_id,
           CAST(length(dirty) AS BIGINT) AS n_chars_dirty,
           CAST(length({sql_normalize_ws('dirty')}) AS BIGINT) AS n_chars_norm,
           md5({sql_normalize_ws('dirty')}) AS norm_md5,
           {sql_normalize_ws('dirty')} =
             trim(regexp_replace(text, '\\s+', ' ', 'g')) AS roundtrip
    FROM dirty
    """,
)
def text_normalize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode/whitespace normalization stage (the C4/CCNet cleanup
    pass that precedes tokenization): delete zero-width characters,
    map C0 controls + NBSP to spaces, collapse whitespace, trim.

    The corpus is dirtied deterministically (doc_id % 4 picks tabs /
    double spaces / U+200B / BEL+NBSP+US corruption) so the oracle
    checks a real transformation; `roundtrip` pins the invariant
    normalize(dirty(text)) == canonical(text) for EVERY row — the
    normalizer provably undoes all four corruption modes.

    Scale (100 TB stance): pure per-row projection — no shuffle, no
    UDF; regexes run inside WholeStageCodegen and the scan only reads
    (doc_id, text)."""
    d = _dirty_corpus(widen_scan(load(spark, sf_dir, "documents")))
    norm = normalize_ws_text(F.col("dirty"))
    canonical = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    return d.select(
        "doc_id",
        F.length("dirty").cast("bigint").alias("n_chars_dirty"),
        F.length(norm).cast("bigint").alias("n_chars_norm"),
        F.md5(norm).alias("norm_md5"),
        (norm == canonical).alias("roundtrip"),
    )


# ---------------------------------------------------------------------------
# HTML text extraction
# ---------------------------------------------------------------------------

# Markup wrapper pieces (shared literals with the SQL construction).
_HTML_PRE_TITLE = "<html><head><title>Doc "
_HTML_MID_TITLE = " - "
_HTML_POST_TITLE = (
    '</title><style type="text/css">p{margin:0;padding:0}</style>'
    '</head><body onload="init()"><h1>Overview</h1><p class="main">'
)
_HTML_POST_BODY = (
    "</p><ul><li>item &lt;1&gt;</li><li>R &amp; D</li></ul>"
    '<script type="text/javascript">var t='
)
_HTML_PRE_COMMENT = ";track(t);</script><!-- src: "
_HTML_TAIL = " --></body></html>"

_SQL_HTML_CORPUS = f"""
  SELECT doc_id,
         '{_HTML_PRE_TITLE}' || CAST(doc_id AS VARCHAR) ||
         '{_HTML_MID_TITLE}' || source ||
         '{_HTML_POST_TITLE.replace("'", "''")}' || text ||
         '{_HTML_POST_BODY.replace("'", "''")}' || CAST(doc_id AS VARCHAR) ||
         '{_HTML_PRE_COMMENT}' || source || '{_HTML_TAIL}' AS markup
  FROM documents
"""


def _html_corpus(docs: DataFrame) -> DataFrame:
    """(doc_id, markup): documents wrapped in a deterministic HTML
    shell — title, style block, heading, entity-bearing list items,
    script block, and an HTML comment."""
    ds = F.col("doc_id").cast("string")
    return docs.select(
        "doc_id",
        F.concat(
            F.lit(_HTML_PRE_TITLE),
            ds,
            F.lit(_HTML_MID_TITLE),
            F.col("source"),
            F.lit(_HTML_POST_TITLE),
            F.col("text"),
            F.lit(_HTML_POST_BODY),
            ds,
            F.lit(_HTML_PRE_COMMENT),
            F.col("source"),
            F.lit(_HTML_TAIL),
        ).alias("markup"),
    )


def html_extract_text(markup: Column) -> Column:
    """Markup -> visible text: drop comments, script and style blocks
    wholesale; every remaining tag becomes a space; decode the five
    core entities (&amp; LAST so '&amp;lt;' does not double-decode);
    collapse whitespace. RE2∩Java regexes only — lowercase tag names
    match this corpus; a real crawl adds (?i)."""
    c = F.regexp_replace(markup, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?s)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?s)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"<[^>]*>", " ")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&amp;", "&")):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def _sql_html_extract(expr: str) -> str:
    body = f"regexp_replace({expr}, '(?s)<!--.*?-->', ' ', 'g')"
    body = f"regexp_replace({body}, '(?s)<script[^>]*>.*?</script>', ' ', 'g')"
    body = f"regexp_replace({body}, '(?s)<style[^>]*>.*?</style>', ' ', 'g')"
    body = f"regexp_replace({body}, '<[^>]*>', ' ', 'g')"
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "''"), ("&amp;", "&")):
        body = f"replace({body}, '{ent}', '{ch}')"
    return f"trim(regexp_replace({body}, '\\s+', ' ', 'g'))"


@query(
    "html_text_extract",
    oracle=f"""
    WITH h AS ({_SQL_HTML_CORPUS}),
    x AS (
      SELECT doc_id,
             regexp_extract(markup, '<title>(.*?)</title>', 1) AS title,
             {_sql_html_extract('markup')} AS body
      FROM h
    )
    SELECT doc_id, title,
           md5(body) AS body_md5,
           CAST(length(body) AS BIGINT) AS n_chars,
           CAST(len(string_split(body, ' ')) AS BIGINT) AS n_words
    FROM x
    """,
)
def html_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> text extraction (the WARC->WET step of a web-corpus
    pipeline, cf. trafilatura/jusText's core loop): title capture,
    comment/script/style removal, tag stripping, entity decoding,
    whitespace canonicalization.

    Runs over a markup corpus constructed identically in both engines
    (style + script + comment + entity-bearing list items wrap each
    document), so the hash checks that boilerplate code/CSS/comments
    are GONE from the extract while entity-decoded visible text
    ('item <1>', 'R & D') survives.

    Scale (100 TB stance): per-row projection only — regex chains in
    WholeStageCodegen, no shuffle; at crawl scale this runs as wide as
    the scan and is bounded by gunzip+regex CPU, the right bottleneck."""
    h = _html_corpus(load(spark, sf_dir, "documents"))
    body = html_extract_text(F.col("markup"))
    return h.select(
        "doc_id",
        F.regexp_extract("markup", r"<title>(.*?)</title>", 1).alias("title"),
        F.md5(body).alias("body_md5"),
        F.length(body).cast("bigint").alias("n_chars"),
        F.size(F.split(body, " ", -1)).cast("bigint").alias("n_words"),
    )


# ---------------------------------------------------------------------------
# Registrable-domain (eTLD+1) extraction + per-domain caps
# ---------------------------------------------------------------------------

_SUBS = ("www.", "blog.", "cdn.", "")
_BASES = ("example", "news-site", "shop", "wiki", "forum")
_SUFFIXES = ("com", "org", "co.uk", "net", "ac.uk")
_MULTI_SUFFIXES = ("co.uk", "ac.uk")  # tiny public-suffix list stand-in
_DOMAIN_CAP = 12

_SQL_URL_CORPUS = f"""
  SELECT doc_id,
         'https://' ||
         (list_value{_SUBS!r}[
            CAST(('0x' || substr(md5('sub' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 4 AS INT) + 1]) ||
         (list_value{_BASES!r}[
            CAST(('0x' || substr(md5('dom' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 5 AS INT) + 1]) ||
         '.' ||
         (list_value{_SUFFIXES!r}[
            CAST(('0x' || substr(md5('tld' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 5 AS INT) + 1]) ||
         '/d/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
"""


def _url_corpus(docs: DataFrame) -> DataFrame:
    """(doc_id, url): synthetic crawl URLs — hash-chosen subdomain,
    base domain, and public suffix (incl. multi-label co.uk/ac.uk)."""

    def pick(options: tuple[str, ...], salt: str) -> Column:
        h = portable_id_hash(F.concat(F.lit(salt), F.col("doc_id").cast("string")))
        return F.element_at(
            F.array(*[F.lit(o) for o in options]),
            (h % len(options)).cast("int") + 1,
        )

    return docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            pick(_SUBS, "sub"),
            pick(_BASES, "dom"),
            F.lit("."),
            pick(_SUFFIXES, "tld"),
            F.lit("/d/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )


def registrable_domain(url: Column) -> Column:
    """eTLD+1 from a URL: host label list, check the last two labels
    against the multi-label suffix set, keep 3 labels if matched else
    2. The real operator broadcasts the full public-suffix list; the
    comparison topology is identical."""
    host = F.regexp_extract(url, r"^[a-z]+://([^/?#]+)", 1)
    labels = F.split(host, r"\.", -1)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    multi = F.array(*[F.lit(s) for s in _MULTI_SUFFIXES])
    return F.when(
        F.array_contains(multi, last2),
        F.concat_ws(".", F.element_at(labels, -3), last2),
    ).otherwise(last2)


_SQL_REG_DOMAIN = """
  CASE WHEN (labels[-2] || '.' || labels[-1]) IN ('co.uk', 'ac.uk')
       THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
       ELSE labels[-2] || '.' || labels[-1] END
"""


@query(
    "domain_capped_docs",
    oracle=f"""
    WITH u AS ({_SQL_URL_CORPUS}),
    d AS (
      SELECT doc_id, {_SQL_REG_DOMAIN} AS registrable_domain
      FROM (
        SELECT doc_id,
               string_split(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1), '.') AS labels
        FROM u
      )
    ),
    r AS (
      SELECT doc_id, registrable_domain,
             row_number() OVER (
               PARTITION BY registrable_domain
               ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
                        doc_id) AS rn
      FROM d
    ),
    kept AS (
      SELECT registrable_domain,
             CAST(count(*) AS BIGINT) AS n_kept,
             md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS kept_md5
      FROM r WHERE rn <= {_DOMAIN_CAP}
      GROUP BY registrable_domain
    ),
    tot AS (
      SELECT registrable_domain, CAST(count(*) AS BIGINT) AS n_docs
      FROM d GROUP BY registrable_domain
    )
    SELECT t.registrable_domain, t.n_docs, k.n_kept, k.kept_md5
    FROM tot t JOIN kept k USING (registrable_domain)
    """,
)
def domain_capped_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain corpus caps on the registrable domain (the
    C4/RefinedWeb guard against any one site dominating the corpus;
    also the key for robots/paywall policy joins). eTLD+1 extraction
    uses a multi-label public-suffix check, so shop.co.uk and
    www.shop.co.uk collapse to one domain while shop.com stays
    distinct.

    Which documents survive the cap is deterministic (portable doc-id
    hash order) and hash-checked per domain via kept_md5 — not just
    the counts.

    Scale (100 TB stance): rank-filter BEFORE any aggregation so the
    per-domain limit evaluates as WindowGroupLimit (plan-pinned) —
    each shuffle partition retains at most cap rows per domain instead
    of sorting whole domains; the totals agg and the ranked filter
    share one domain-keyed exchange (ReusedExchange)."""
    d = _url_corpus(load(spark, sf_dir, "documents")).select(
        "doc_id", registrable_domain(F.col("url")).alias("registrable_domain")
    )
    w = (
        Window.partitionBy("registrable_domain")
        .orderBy(portable_id_hash(F.col("doc_id")), F.col("doc_id"))
    )
    kept = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _DOMAIN_CAP)
        .groupBy("registrable_domain")
        .agg(
            F.count("*").cast("bigint").alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list("doc_id")),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                )
            ).alias("kept_md5"),
        )
    )
    tot = d.groupBy("registrable_domain").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    return tot.join(kept, "registrable_domain").select(
        "registrable_domain", "n_docs", "n_kept", "kept_md5"
    )


# ---------------------------------------------------------------------------
# URL canonicalization + domain blocklist (round 11)
# ---------------------------------------------------------------------------
#
# The RefinedWeb/C4-style pre-filter step upstream of domain caps: a
# crawl's URL column arrives messy (case, default ports, tracking
# params, fragments, trailing slashes, www.) and the SAME page must
# collapse to ONE canonical key before URL-level dedup or any domain
# policy join. As above, the messy corpus is synthesized
# term-identically in Spark and DuckDB (page identity = doc_id // 3,
# so canonical collisions are planted by construction), which makes
# the canonicalization algebra itself the thing the value hash checks.

_SCHEMES = ("https", "HTTPS", "Https")
_CANON_SUBS = ("", "blog.")
_REAL_PARAMS = ("", "v=1", "v=2")
_TRK_PARAMS = ("", "utm_source=feed", "gclid=g123", "fbclid=f9", "ref=rss")
_FRAGS = ("", "#top", "#sec-2")
_URL_BLOCKLIST = ("shop.com", "forum.co.uk", "news-site.net")


def _hsalt(salt: str, key: Column) -> Column:
    return portable_id_hash(F.concat(F.lit(salt), key.cast("string")))


def _hpick(options: tuple[str, ...], salt: str, key: Column) -> Column:
    return F.element_at(
        F.array(*[F.lit(o) for o in options]),
        (_hsalt(salt, key) % len(options)).cast("int") + 1,
    )


def _sql_hsalt(salt: str, key: str) -> str:
    return (
        f"('0x' || substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 8))"
        "::BIGINT"
    )


def _sql_hpick(options: tuple[str, ...], salt: str, key: str) -> str:
    return (
        f"(list_value{options!r}[CAST({_sql_hsalt(salt, key)} "
        f"% {len(options)} AS INT) + 1])"
    )


def _messy_url_corpus(docs: DataFrame) -> DataFrame:
    """(doc_id, source, url): the url is one of many raw spellings of
    the page keyed by page = doc_id // 3 — scheme case, host case,
    optional :443, optional www., trailing slash, tracking params in
    varying order, and a fragment are all doc-keyed noise; only the
    subdomain/base/suffix/path/real-param are page-keyed identity."""
    doc, page = F.col("doc_id"), F.floor(F.col("doc_id") / 3)
    sub = _hpick(_CANON_SUBS, "sub", page)
    host = F.concat(
        F.when(
            (sub == "") & (_hsalt("www", doc) % 2 == 0), F.lit("www.")
        ).otherwise(F.lit("")),
        sub,
        _hpick(_BASES, "dom", page),
        F.lit("."),
        _hpick(_SUFFIXES, "tld", page),
    )
    realp = _hpick(_REAL_PARAMS, "q", page)
    trk = _hpick(_TRK_PARAMS, "trk", doc)
    qs = F.array_join(
        F.filter(
            F.when(
                _hsalt("ord", doc) % 2 == 0, F.array(realp, trk)
            ).otherwise(F.array(trk, realp)),
            lambda p: p != "",
        ),
        "&",
    )
    url = F.concat(
        _hpick(_SCHEMES, "sch", doc),
        F.lit("://"),
        F.when(_hsalt("case", doc) % 2 == 0, F.upper(host)).otherwise(host),
        F.when(_hsalt("port", doc) % 3 == 0, F.lit(":443")).otherwise(
            F.lit("")
        ),
        F.lit("/p/"),
        page.cast("string"),
        F.when(_hsalt("slash", doc) % 2 == 0, F.lit("/")).otherwise(
            F.lit("")
        ),
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
        _hpick(_FRAGS, "frag", doc),
    )
    return docs.select("doc_id", "source", url.alias("url"))


_SQL_MESSY_URL_CORPUS = f"""
  SELECT doc_id, source,
         {_sql_hpick(_SCHEMES, "sch", "doc_id")} || '://' ||
         (CASE WHEN {_sql_hsalt("case", "doc_id")} % 2 = 0
               THEN upper(hostfull) ELSE hostfull END) ||
         (CASE WHEN {_sql_hsalt("port", "doc_id")} % 3 = 0
               THEN ':443' ELSE '' END) ||
         '/p/' || CAST(page AS VARCHAR) ||
         (CASE WHEN {_sql_hsalt("slash", "doc_id")} % 2 = 0
               THEN '/' ELSE '' END) ||
         (CASE WHEN qs <> '' THEN '?' || qs ELSE '' END) ||
         {_sql_hpick(_FRAGS, "frag", "doc_id")} AS url
  FROM (
    SELECT doc_id, source, page,
           (CASE WHEN sub = '' AND {_sql_hsalt("www", "doc_id")} % 2 = 0
                 THEN 'www.' ELSE '' END) || sub ||
           {_sql_hpick(_BASES, "dom", "page")} || '.' ||
           {_sql_hpick(_SUFFIXES, "tld", "page")} AS hostfull,
           coalesce(array_to_string(list_filter(
             CASE WHEN {_sql_hsalt("ord", "doc_id")} % 2 = 0
                  THEN [realp, trk] ELSE [trk, realp] END,
             p -> p <> ''), '&'), '') AS qs
    FROM (
      SELECT doc_id, source, doc_id // 3 AS page,
             {_sql_hpick(_CANON_SUBS, "sub", "(doc_id // 3)")} AS sub,
             {_sql_hpick(_REAL_PARAMS, "q", "(doc_id // 3)")} AS realp,
             {_sql_hpick(_TRK_PARAMS, "trk", "doc_id")} AS trk
      FROM documents
    )
  )
"""


def canonicalize_url(url: Column) -> Column:
    """Deterministic URL canonical form: lowercase scheme and host,
    strip default ports (:80/:443), strip a leading www., strip the
    fragment, drop trailing slashes from the path, remove tracking
    params (utm_*, gclid, fbclid, ref) and emit the survivors sorted.
    http vs https are NOT folded — scheme identity is preserved."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z]+)://", 1))
    hostport = F.lower(F.regexp_extract(url, r"^[A-Za-z]+://([^/?#]+)", 1))
    host = F.regexp_replace(
        F.regexp_replace(hostport, r":(80|443)$", ""), r"^www\.", ""
    )
    path = F.regexp_replace(
        F.regexp_extract(url, r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1),
        r"/+$",
        "",
    )
    qs = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.array_join(
        F.array_sort(
            F.filter(
                F.split(qs, "&", -1),
                lambda p: (p != "")
                & ~p.startswith("utm_")
                & ~p.startswith("gclid=")
                & ~p.startswith("fbclid=")
                & ~p.startswith("ref="),
            )
        ),
        "&",
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(params != "", F.concat(F.lit("?"), params)).otherwise(
            F.lit("")
        ),
    )


def _sql_canonicalize(u: str) -> str:
    """DuckDB mirror of canonicalize_url (array_to_string of an empty
    list is NULL in DuckDB — coalesce'd per the repo gotcha)."""
    params = (
        "coalesce(array_to_string(list_sort(list_filter(string_split("
        f"regexp_extract({u}, '\\?([^#]*)', 1), '&'), "
        "p -> p <> '' AND NOT starts_with(p, 'utm_') "
        "AND NOT starts_with(p, 'gclid=') "
        "AND NOT starts_with(p, 'fbclid=') "
        "AND NOT starts_with(p, 'ref='))), '&'), '')"
    )
    return f"""
      lower(regexp_extract({u}, '^([A-Za-z]+)://', 1)) || '://' ||
      regexp_replace(regexp_replace(
        lower(regexp_extract({u}, '^[A-Za-z]+://([^/?#]+)', 1)),
        ':(80|443)$', ''), '^www\\.', '') ||
      regexp_replace(
        regexp_extract({u}, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1),
        '/+$', '') ||
      (CASE WHEN {params} <> '' THEN '?' || {params} ELSE '' END)
    """


@query(
    "url_canonical_dedup",
    oracle=f"""
    WITH u AS ({_SQL_MESSY_URL_CORPUS}),
    c AS (
      SELECT doc_id, url, {_sql_canonicalize("url")} AS canonical_url
      FROM u
    )
    SELECT canonical_url,
           CAST(count(*) AS BIGINT) AS n_variants,
           CAST(count(DISTINCT url) AS BIGINT) AS n_raw_forms,
           CAST(min(doc_id) AS BIGINT) AS keeper_doc_id
    FROM c GROUP BY canonical_url HAVING count(*) >= 2
    """,
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup key construction: canonicalize every raw URL
    and report each canonical page reached by >= 2 raw spellings,
    with the deterministic keeper (min doc_id) a dedup pass would
    retain. The messy corpus plants 3 raw spellings per page, so the
    collision machinery is exercised on every row, and the value hash
    checks the canonical STRINGS, not just counts.

    Scale: pure per-row string algebra (regexp/array ops, no UDFs)
    into one canonical-keyed map-side-combinable aggregate — the same
    shuffle shape as exact_dedup. 100 TB-safe by construction."""
    m = _messy_url_corpus(load(spark, sf_dir, "documents"))
    return (
        m.select(
            "doc_id",
            "url",
            canonicalize_url(F.col("url")).alias("canonical_url"),
        )
        .groupBy("canonical_url")
        .agg(
            F.count("*").cast("bigint").alias("n_variants"),
            F.countDistinct("url").cast("bigint").alias("n_raw_forms"),
            F.min("doc_id").cast("bigint").alias("keeper_doc_id"),
        )
        .filter(F.col("n_variants") >= 2)
    )


@query(
    "domain_blocklist_report",
    oracle=f"""
    WITH u AS ({_SQL_MESSY_URL_CORPUS}),
    c AS (
      SELECT doc_id, source, {_sql_canonicalize("url")} AS curl FROM u
    ),
    d AS (
      SELECT doc_id, source, {_SQL_REG_DOMAIN} AS rd
      FROM (
        SELECT doc_id, source,
               string_split(regexp_extract(curl,
                 '^[a-z]+://([^/?#]+)', 1), '.') AS labels
        FROM c
      )
    ),
    flagged AS (
      SELECT doc_id, source, rd,
             CASE WHEN rd IN {_URL_BLOCKLIST!r} THEN 1 ELSE 0 END
               AS blocked
      FROM d
    ),
    ranked AS (
      SELECT source, blocked,
             row_number() OVER (
               PARTITION BY blocked, rd
               ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                         1, 8))::BIGINT, doc_id) AS rn
      FROM flagged
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(blocked) AS BIGINT) AS n_blocked,
           CAST(sum(CASE WHEN blocked = 0 AND rn > {_DOMAIN_CAP}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_capped_out,
           CAST(sum(CASE WHEN blocked = 0 AND rn <= {_DOMAIN_CAP}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(sum(CASE WHEN blocked = 0 AND rn <= {_DOMAIN_CAP}
                     THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             AS kept_share
    FROM ranked GROUP BY source
    """,
)
def domain_blocklist_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed domain-policy pre-filter a web pipeline runs
    after canonicalization: registrable-domain blocklist (broadcast
    IN-list; the stand-in for a policy/robots denylist join) plus the
    per-domain cap of domain_capped_docs, accounted per SOURCE so a
    corpus owner sees exactly where volume was lost (blocked vs
    capped vs kept).

    Scale: canonicalize + eTLD+1 are per-row string algebra. The cap
    membership is decided by a per-domain THRESHOLD tuple, not by
    ranking every row: a rank-filtered window (rn <= cap, which
    Spark's WindowGroupLimit prunes map-side to at most cap rows per
    domain per shuffle partition) yields the cap-th smallest
    (hash, doc_id) per surviving domain; the main path then
    broadcast-joins that bounded table (one row per distinct domain)
    and a row is kept iff its tuple <= threshold. The full corpus is
    never shuffled or sorted by domain — the old form consumed
    rn > cap rows (n_capped_out), so WindowGroupLimit could not prune
    it and each domain partition sorted O(N/domains) rows in one
    task. Cost: a second scan of the corpus, which at scale is far
    cheaper than the full-row domain shuffle it replaces. One final
    source-keyed map-side-combinable aggregate. No collects.

    Domain-cardinality assumption (r12 advice): the broadcast side is
    one row per distinct SURVIVING eTLD+1 domain, which grows with
    corpus size — web-scale corpora carry tens of millions of
    domains, and a forced broadcast of that table would blow the
    driver/executor broadcast limits even though it is sublinear at
    the 10x probe. Set
    ``spark.clickstreamtoclickhouse.domainJoin=shuffle`` to drop the
    hint and let the optimizer/AQE pick a shuffle hash join when the
    threshold table is too large to ship; the default stays
    ``broadcast`` (correct while |domains| x ~40B/row fits the
    broadcast budget). Both paths are value-identical
    (test_domain_blocklist_shuffle_fallback_parity)."""
    m = _messy_url_corpus(load(spark, sf_dir, "documents"))
    d = m.select(
        "doc_id",
        "source",
        registrable_domain(canonicalize_url(F.col("url"))).alias("rd"),
    )
    blocklist = F.array(*[F.lit(b) for b in _URL_BLOCKLIST])
    flagged = d.select(
        "doc_id",
        "source",
        "rd",
        F.when(F.array_contains(blocklist, F.col("rd")), 1)
        .otherwise(0)
        .alias("blocked"),
    ).localCheckpoint(eager=False)
    # ^ r14: flagged feeds the threshold build AND the main join —
    # unpinned, the canonicalize + eTLD+1 string algebra (a ~100 KB
    # expression tree) ran twice and appeared twice in a 235 KB plan
    # costing ~0.9 s of pure planning (guide §3.3/§7.3). One
    # execution, one appearance. (The docstring's "second scan of the
    # corpus" now reads from this narrow checkpoint instead.)
    key = F.struct(
        portable_id_hash(F.col("doc_id")).alias("h"),
        F.col("doc_id").alias("id"),
    )
    # blocked is a pure function of rd, so thresholds are only needed
    # (and only computed) for surviving domains
    w = Window.partitionBy("rd").orderBy(
        portable_id_hash(F.col("doc_id")), F.col("doc_id")
    )
    thr = (
        flagged.filter(F.col("blocked") == 0)
        .select("rd", key.alias("k"), F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _DOMAIN_CAP)
        .groupBy("rd")
        .agg(F.max("k").alias("thr"))
    )
    mode = spark.conf.get(
        "spark.clickstreamtoclickhouse.domainJoin", "broadcast"
    )
    thr_side = F.broadcast(thr) if mode == "broadcast" else thr
    joined = flagged.join(thr_side, "rd", "left")
    survivor = F.col("blocked") == 0
    kept = survivor & (key <= F.col("thr"))
    return joined.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("blocked").cast("bigint").alias("n_blocked"),
        F.sum(F.when(survivor & ~kept, 1).otherwise(0))
        .cast("bigint")
        .alias("n_capped_out"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.round(
            F.sum(F.when(kept, 1).otherwise(0)) * 1.0 / F.count("*"), 6
        ).alias("kept_share"),
    )


# ---------------------------------------------------------------------------
# Robots-style longest-prefix policy filter (round 11)
# ---------------------------------------------------------------------------
#
# The crawl-policy re-filter a corpus owner runs when a domain's
# robots/usage policy changes AFTER fetch: per-domain prefix rules,
# most-specific (longest) matching prefix wins (the robots.txt
# precedence rule; allow wins exact ties). Rules here are synthesized
# per registrable domain from the portable hash so every branch of the
# precedence logic is exercised and oracle-checked.

_ROBOTS_PREFIXES = ("/p/", "/p/1", "/p/12")  # beyond the "" default


def _robots_rules(doms: DataFrame) -> DataFrame:
    """(rd, prefix, decision, plen): the '' default-allow rule plus
    three hash-polarized prefix rules per domain — prefix lengths are
    unique within a domain, so the longest-match winner is unique."""
    rd = F.col("rd")

    def pol(salt: str, yes: str, no: str) -> Column:
        return F.when(_hsalt(salt, rd) % 2 == 0, F.lit(yes)).otherwise(
            F.lit(no)
        )

    rules = F.array(
        F.struct(F.lit("").alias("prefix"), F.lit("allow").alias("decision")),
        F.struct(
            F.lit(_ROBOTS_PREFIXES[0]).alias("prefix"),
            pol("r1", "disallow", "allow").alias("decision"),
        ),
        F.struct(
            F.lit(_ROBOTS_PREFIXES[1]).alias("prefix"),
            pol("r2", "allow", "disallow").alias("decision"),
        ),
        F.struct(
            F.lit(_ROBOTS_PREFIXES[2]).alias("prefix"),
            pol("r3", "disallow", "allow").alias("decision"),
        ),
    )
    r = doms.select("rd", F.explode(rules).alias("r"))
    return r.select(
        "rd",
        F.col("r.prefix").alias("prefix"),
        F.col("r.decision").alias("decision"),
        F.length("r.prefix").cast("int").alias("plen"),
    )


def _sql_robots_rules(doms_cte: str) -> str:
    def pol(salt: str, yes: str, no: str) -> str:
        return (
            f"CASE WHEN {_sql_hsalt(salt, 'rd')} % 2 = 0 "
            f"THEN '{yes}' ELSE '{no}' END"
        )

    p = _ROBOTS_PREFIXES
    return f"""
      SELECT rd, '' AS prefix, 'allow' AS decision, 0 AS plen
      FROM {doms_cte}
      UNION ALL
      SELECT rd, '{p[0]}', {pol("r1", "disallow", "allow")}, {len(p[0])}
      FROM {doms_cte}
      UNION ALL
      SELECT rd, '{p[1]}', {pol("r2", "allow", "disallow")}, {len(p[1])}
      FROM {doms_cte}
      UNION ALL
      SELECT rd, '{p[2]}', {pol("r3", "disallow", "allow")}, {len(p[2])}
      FROM {doms_cte}
    """


@query(
    "robots_policy_filter",
    oracle=f"""
    WITH u AS ({_SQL_MESSY_URL_CORPUS}),
    c AS (
      SELECT doc_id, source, {_sql_canonicalize("url")} AS curl FROM u
    ),
    d AS (
      SELECT doc_id, source,
             regexp_extract(curl, '^[a-z]+://[^/?#]+([^?#]*)', 1)
               AS path,
             {_SQL_REG_DOMAIN} AS rd
      FROM (
        SELECT doc_id, source, curl,
               string_split(regexp_extract(curl,
                 '^[a-z]+://([^/?#]+)', 1), '.') AS labels
        FROM c
      )
    ),
    doms AS (
      SELECT b.b || '.' || sx.s AS rd
      FROM (SELECT unnest(list_value{_BASES!r}) AS b) b
      CROSS JOIN (SELECT unnest(list_value{_SUFFIXES!r}) AS s) sx
    ),
    rules AS ({_sql_robots_rules("doms")}),
    matched AS (
      SELECT d.doc_id, d.rd, r.decision, r.plen
      FROM d JOIN rules r
        ON d.rd = r.rd AND starts_with(d.path, r.prefix)
    ),
    win AS (
      SELECT doc_id, rd,
             arg_max(decision, plen * 2 +
                     CASE WHEN decision = 'allow' THEN 1 ELSE 0 END)
               AS decision
      FROM matched GROUP BY doc_id, rd
    )
    SELECT rd AS registrable_domain,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(sum(CASE WHEN decision = 'allow' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_allowed,
           CAST(sum(CASE WHEN decision = 'disallow' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_disallowed,
           round(sum(CASE WHEN decision = 'allow' THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS allowed_share
    FROM win GROUP BY rd
    """,
)
def robots_policy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-prefix-match policy join (the robots.txt precedence
    rule — RFC 9309 §2.2.2: most specific match wins, allow wins
    ties): every canonical URL against its domain's prefix rules,
    winner = max by (prefix length, allow-on-tie), reported per
    domain. The re-filter pass a corpus runs when usage policies
    change after the crawl.

    Scale: the rules side is the STATIC 25x4 (base x suffix) literal
    relation (no corpus scan, no distinct shuffle), BROADCAST
    into the match join, so the unbounded URL side never shuffles for
    the join; the winner is one map-side-combinable max_by aggregate
    keyed on doc_id (<=4 candidate rows per URL by construction), then
    a domain-keyed rollup. No windows at all."""
    m = _messy_url_corpus(load(spark, sf_dir, "documents"))
    curl = canonicalize_url(F.col("url"))
    d = m.select(
        "doc_id",
        "source",
        F.regexp_extract(curl, r"^[a-z]+://[^/?#]+([^?#]*)", 1).alias(
            "path"
        ),
        registrable_domain(curl).alias("rd"),
    )
    # the registrable-domain universe is the static base x suffix cross
    # (eTLD+1 strips subdomains), so the rules side needs NO corpus
    # scan or distinct shuffle — it is a 25x4 literal relation
    doms = (
        spark.range(1)
        .select(
            F.explode(
                F.flatten(
                    F.array(
                        *[
                            F.array(
                                *[
                                    F.lit(f"{b}.{sx}")
                                    for sx in _SUFFIXES
                                ]
                            )
                            for b in _BASES
                        ]
                    )
                )
            ).alias("rd")
        )
    )
    rules = _robots_rules(doms)
    matched = d.join(F.broadcast(rules), "rd").filter(
        F.col("path").startswith(F.col("prefix"))
    )
    ordv = F.col("plen") * 2 + F.when(
        F.col("decision") == "allow", 1
    ).otherwise(0)
    win = matched.groupBy("doc_id", "rd").agg(
        F.max_by("decision", ordv).alias("decision")
    )
    allow = F.when(F.col("decision") == "allow", 1).otherwise(0)
    return win.groupBy(F.col("rd").alias("registrable_domain")).agg(
        F.count("*").cast("bigint").alias("n_urls"),
        F.sum(allow).cast("bigint").alias("n_allowed"),
        F.sum(1 - allow).cast("bigint").alias("n_disallowed"),
        F.round(F.sum(allow) * 1.0 / F.count("*"), 6).alias(
            "allowed_share"
        ),
    )


# ---------------------------------------------------------------------------
# Anchor-text aggregation over a synthetic link graph (round 11)
# ---------------------------------------------------------------------------
#
# The web-graph op behind anchor-text corpora (search ranking and
# grounded-LLM training both consume "how the web describes page X"):
# aggregate the anchor strings of all in-links per target page. The
# link graph is synthesized deterministically (two modular-arithmetic
# out-links per doc over the page universe), term-identically in both
# engines; anchors are the source doc's first three words.

_ANCHOR_WORDS = 3
_LINK_MULTS = ((7, 3), (13, 5))  # two out-links: (a*doc_id + b) mod P


@query(
    "anchor_text_aggregation",
    oracle=f"""
    WITH pu AS (
      SELECT CAST(max(doc_id) // 3 + 1 AS BIGINT) AS p FROM documents
    ),
    anchors AS (
      SELECT doc_id,
             array_to_string(list_slice(
               {tx.SQL_WORDS.format(t="lower(text)")}, 1,
               {_ANCHOR_WORDS}), ' ') AS anchor
      FROM documents WHERE length(trim(text)) > 0
    ),
    links AS (
      SELECT a.doc_id AS src, (a.doc_id * 7 + 3) % pu.p AS target_page,
             a.anchor
      FROM anchors a CROSS JOIN pu
      UNION ALL
      SELECT a.doc_id, (a.doc_id * 13 + 5) % pu.p, a.anchor
      FROM anchors a CROSS JOIN pu
    ),
    per_anchor AS (
      SELECT target_page, anchor, CAST(count(*) AS BIGINT) AS cnt
      FROM links GROUP BY target_page, anchor
    )
    SELECT target_page,
           CAST(sum(cnt) AS BIGINT) AS n_inlinks,
           CAST(count(*) AS BIGINT) AS n_unique_anchors,
           max(struct_pack(cnt := cnt, anchor := anchor)).anchor
             AS top_anchor,
           CAST(max(struct_pack(cnt := cnt, anchor := anchor)).cnt
             AS BIGINT) AS top_anchor_count
    FROM per_anchor GROUP BY target_page
    """,
)
def anchor_text_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-target anchor-text rollup over the link graph: in-link
    count, distinct anchor count, and the dominant anchor (max by
    (count, anchor) — deterministic tie on the string). 'How the web
    describes this page' is a ranking/grounding signal the crawl
    pipeline materializes alongside the page corpus.

    Scale: anchors are a per-row projection; the link explode is a
    2x UNION (constant fan); two map-side-combinable keyed aggregates
    ((target, anchor) then target) — the same shuffle discipline as
    exact_dedup. The dominant-anchor argmax is a struct max INSIDE
    the aggregate, not a window."""
    docs = load(spark, sf_dir, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    p = load(spark, sf_dir, "documents").agg(
        (F.floor(F.max("doc_id") / 3) + 1).cast("long").alias("p")
    )
    anchors = docs.select(
        "doc_id",
        F.array_join(
            F.slice(tx.words(F.lower(F.col("text"))), 1, _ANCHOR_WORDS), " "
        ).alias("anchor"),
    ).crossJoin(F.broadcast(p))
    links = None
    for a, b in _LINK_MULTS:
        part = anchors.select(
            F.pmod(F.col("doc_id") * a + b, F.col("p")).alias(
                "target_page"
            ),
            "anchor",
        )
        links = part if links is None else links.unionByName(part)
    per_anchor = links.groupBy("target_page", "anchor").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    top = F.max(F.struct(F.col("cnt"), F.col("anchor")))
    return per_anchor.groupBy("target_page").agg(
        F.sum("cnt").cast("long").alias("n_inlinks"),
        F.count(F.lit(1)).cast("long").alias("n_unique_anchors"),
        top["anchor"].alias("top_anchor"),
        top["cnt"].cast("long").alias("top_anchor_count"),
    )
