"""Web-crawl ingestion: WARC shards → records → extracted text.

The front door of every pretraining-data pipeline (CommonCrawl-style):
crawl output arrives as WARC shards — concatenated per-record gzip
members, each member one WARC record (response / request / metadata)
wrapping an HTTP message wrapping HTML. This module turns a binary
shard column into clean text rows:

- :func:`synthetic_warc_shards` — deterministic fixture shards whose
  payloads are REAL gzip + WARC/1.0 + HTTP + HTML bytes derived from
  md5, so the whole decode path is value-checkable by regenerating the
  expected values from the same formula (the PNG/BMP oracle pattern,
  multimodal.py).
- :func:`parse_warc_records` — the one deliberate Python boundary
  (Arrow-batched mapInPandas, stdlib zlib only): split gzip members,
  parse WARC + HTTP framing, emit one row per *response* record with
  the raw HTML payload. Request/metadata records are counted, not
  emitted.
- :func:`extract_html_text` — pure JVM regexp pipeline (no Python):
  drop script/style blocks, strip tags, collapse whitespace, pull the
  <title>; emits the narrow projection with an md5 of the cleaned text
  so oracles verify the emitted bytes.

Scale shape: the SHARD is the unit of parallelism — one Python kernel
invocation streams one shard (exactly how production workers consume
CommonCrawl WARC files); records never shuffle until they are narrow
(html dropped right after the JVM strip). At 100 TB you repartition by
shard id to executor-core granularity and this plan is unchanged.

Reference parity note: the reference repo has no ingestion layer at
all (it starts from parquet) — this is north-star scope for the
LLM-data pipeline, not reference parity.
"""

from __future__ import annotations

import gzip
import hashlib
import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SHARD_SCHEMA = "shard_id INT, data BINARY"
WARC_RECORD_SCHEMA = (
    "shard_id INT, record_idx INT, uri STRING, http_status INT, "
    "html STRING, n_html_bytes BIGINT"
)


def _mk_html(i: int, j: int, seed: int) -> str:
    p1 = hashlib.md5(f"{seed}:w:{i}:{j}:1".encode()).hexdigest()
    p2 = hashlib.md5(f"{seed}:w:{i}:{j}:2".encode()).hexdigest()
    # third paragraph exercises entity decoding: named + numeric forms,
    # the &amp;amp; single-decode case, and &nbsp; feeding the
    # whitespace collapse — expected clean text: "A &amp; B <x> 'y' & Z !"
    # The link-only <nav> is boilerplate: extract_html_text keeps its
    # text ("Home About"), extract_main_content must cut it.
    # The comment is adversarial: it contains a bare '>' (so a naive
    # tag-strip leaks 'trail -->') and a commented-out absolute link
    # (which must NOT reach the text or mint a link-graph edge).
    return (
        f"<html><head><title>Doc {i}-{j}</title>"
        f"<style>p {{margin: 0}}</style></head>"
        f'<body><nav><a href="/">Home</a> <a href="/a">About</a></nav>'
        f'<!-- bc > trail <a href="https://tracker.example/t">x</a> -->'
        f"<p>{p1}</p><p>{p2}</p>"
        f"<p>A &amp;amp; B &lt;x&gt; &#39;y&#39; &#x26; Z&nbsp;!</p>"
        f"<script>var x = 1 < 2;</script></body></html>"
    )


def _warc_record(rtype: str, uri: str, body: bytes) -> bytes:
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        "WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n"
    ).encode()
    return head + body + b"\r\n\r\n"


def synthetic_warc_shards(
    spark: SparkSession, n_shards: int = 8, docs_per_shard: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Deterministic WARC shard fixture: shard ``i`` holds
    ``docs_per_shard`` response records (HTML derived from md5 of
    ``{seed}:w:{i}:{j}:{1,2}``) interleaved with one request and one
    metadata record per document (which a correct parser must skip,
    not mis-frame) — every member individually gzipped with mtime=0,
    concatenated: the exact CommonCrawl layout, byte-deterministic."""
    rows = []
    for i in range(n_shards):
        blob = b""
        for j in range(docs_per_shard):
            uri = f"https://example.com/{i}/{j}"
            html = _mk_html(i, j, seed).encode()
            http = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + html
            )
            req = b"GET / HTTP/1.1\r\nHost: example.com\r\n\r\n"
            blob += gzip.compress(
                _warc_record("request", uri, req), mtime=0
            )
            blob += gzip.compress(
                _warc_record("response", uri, http), mtime=0
            )
            blob += gzip.compress(
                _warc_record("metadata", uri, b"fetchTimeMs: 12\r\n"),
                mtime=0,
            )
        rows.append((i, bytearray(blob)))
    return spark.createDataFrame(rows, WARC_SHARD_SCHEMA)


def synthetic_charset_warc_shards(
    spark: SparkSession, n_shards: int = 4, docs_per_shard: int = 4,
    seed: int = 42,
) -> DataFrame:
    """WARC shard fixture for CHARSET handling: record ``j`` cycles
    through utf-8 / ISO-8859-1 / quoted windows-1252 / no-charset /
    CHUNKED-utf-8 Content-Type declarations, each carrying non-ASCII
    text (é, ü, €) encoded in the DECLARED charset — so a parser that
    ignores the header or guesses wrong produces mojibake and fails the
    md5 value check. Header case and quoting vary deliberately; the
    chunked record splits its body across two RFC 9112 chunks (one with
    a chunk extension the parser must ignore)."""
    kinds = [
        ("text/html; charset=utf-8", "utf-8", "café Grüße {h}", False),
        ("text/html; Charset=ISO-8859-1", "latin-1", "naïve café {h}",
         False),
        ('text/html; charset="windows-1252"', "cp1252", "café €uro {h}",
         False),
        ("text/html", "utf-8", "plain {h}", False),
        ("text/html; charset=utf-8", "utf-8", "chunked café {h}", True),
    ]
    rows = []
    for i in range(n_shards):
        blob = b""
        for j in range(docs_per_shard):
            ctype, codec, pat, chunked = kinds[j % len(kinds)]
            hpart = hashlib.md5(f"{seed}:cs:{i}:{j}".encode()).hexdigest()
            text = pat.format(h=hpart)
            html = f"<html><body><p>{text}</p></body></html>".encode(codec)
            if chunked:
                cut = len(html) // 2
                body = (
                    f"{cut:x};ext=1\r\n".encode() + html[:cut] + b"\r\n"
                    + f"{len(html) - cut:x}\r\n".encode() + html[cut:]
                    + b"\r\n0\r\n\r\n"
                )
                headers = (
                    f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
                    "Transfer-Encoding: chunked\r\n\r\n"
                )
                http = headers.encode() + body
            else:
                http = (
                    f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n\r\n"
                    .encode()
                    + html
                )
            uri = f"https://example.com/cs/{i}/{j}"
            blob += gzip.compress(
                _warc_record("response", uri, http), mtime=0
            )
        rows.append((i, bytearray(blob)))
    return spark.createDataFrame(rows, WARC_SHARD_SCHEMA)


def _split_gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress a concatenation of gzip members one member at a time
    (``unused_data`` marks each boundary) — stdlib only, streaming."""
    buf = bytes(data)
    while buf:
        d = zlib.decompressobj(wbits=31)
        out = d.decompress(buf)
        yield out
        if not d.eof:
            raise ValueError("truncated gzip member in WARC shard")
        buf = d.unused_data


def _parse_record(raw: bytes) -> tuple[str, str, bytes] | None:
    """(warc_type, uri, body) of one WARC record, or None if malformed."""
    sep = raw.find(b"\r\n\r\n")
    if sep < 0 or not raw.startswith(b"WARC/"):
        return None
    headers = {}
    for line in raw[:sep].decode("utf-8", "replace").split("\r\n")[1:]:
        k, _, v = line.partition(":")
        headers[k.strip().lower()] = v.strip()
    try:
        length = int(headers.get("content-length", ""))
    except ValueError:
        return None
    body = raw[sep + 4 : sep + 4 + length]
    return (
        headers.get("warc-type", ""),
        headers.get("warc-target-uri", ""),
        body,
    )


# Charsets a crawl actually serves and the stdlib decodes without any
# external library; anything else falls back to utf-8 (with replacement
# chars rather than a crash — ingest must not die on a mislabeled page).
_SUPPORTED_CHARSETS = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "us-ascii": "ascii",
    "ascii": "ascii",
    "iso-8859-1": "latin-1",
    "latin-1": "latin-1",
    "latin1": "latin-1",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
}


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked transfer-encoded body (RFC 9112 §7.1):
    hex size line (chunk extensions after ';' ignored), chunk bytes,
    CRLF, repeated until the 0-size terminator. Trailers are ignored.
    Raises on truncation — a half-stored chunked record is corrupt.

    Reassembly is list-append + one join: ``out += chunk`` would copy
    the accumulated prefix per chunk (quadratic — a 10 MB body in 4 KiB
    chunks pushes ~13 GB through the heap inside the per-record WARC
    kernel); the join is linear in body size regardless of chunking."""
    parts: list[bytes] = []
    pos = 0
    while True:
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            raise ValueError("truncated chunked HTTP body")
        size_token = body[pos:nl].split(b";")[0].strip()
        try:
            size = int(size_token, 16)
        except ValueError:
            raise ValueError("invalid chunk size in HTTP body") from None
        if size == 0:
            return b"".join(parts)
        chunk = body[nl + 2 : nl + 2 + size]
        if len(chunk) != size:
            raise ValueError("truncated chunked HTTP body")
        parts.append(chunk)
        pos = nl + 2 + size + 2  # chunk bytes + trailing CRLF


def _http_charset(headers: bytes) -> str:
    """Charset from an HTTP header block's Content-Type (RFC 9110
    ``charset=`` parameter, case-insensitive, optional quotes);
    'utf-8' when absent or unrecognized."""
    m = re.search(
        rb"(?im)^content-type:[^\r\n]*charset=\"?([A-Za-z0-9_-]+)",
        headers,
    )
    if not m:
        return "utf-8"
    return _SUPPORTED_CHARSETS.get(
        m.group(1).decode("ascii", "replace").lower(), "utf-8"
    )


def parse_warc_records(shards: DataFrame) -> DataFrame:
    """One row per WARC *response* record: (shard_id, record_idx, uri,
    http_status, html, n_html_bytes). ``record_idx`` numbers response
    records within their shard in stream order (the stable record
    identity a re-crawl diff would key on); request/metadata records
    advance the stream but emit nothing. The HTML bytes decode with the
    charset the HTTP Content-Type declares (utf-8 / ascii / latin-1 /
    cp1252 — the set real crawls dominate; unknown or absent labels
    fall back to utf-8 with replacement, never a crash).

    The deliberate Python boundary: gzip member framing and WARC/HTTP
    header parsing are byte protocols no SQL engine expresses —
    Arrow-batched mapInPandas, one kernel call per shard batch, bytes
    stay in Arrow buffers. Everything downstream is JVM-side.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "shard_id": [], "record_idx": [], "uri": [],
                "http_status": [], "html": [], "n_html_bytes": [],
            }
            for sid, data in zip(pdf["shard_id"], pdf["data"]):
                idx = 0
                for member in _split_gzip_members(bytes(data)):
                    rec = _parse_record(member)
                    if rec is None or rec[0] != "response":
                        continue
                    _, uri, body = rec
                    hsep = body.find(b"\r\n\r\n")
                    if hsep < 0 or not body.startswith(b"HTTP/"):
                        continue
                    status_line = body[:hsep].split(b"\r\n", 1)[0]
                    parts = status_line.split(b" ")
                    try:
                        status = int(parts[1])
                    except (IndexError, ValueError):
                        continue
                    html = body[hsep + 4 :]
                    headers = body[:hsep]
                    if b"chunked" in headers.lower() and re.search(
                        rb"(?im)^transfer-encoding:[^\r\n]*chunked",
                        headers,
                    ):
                        html = _dechunk(html)
                    charset = _http_charset(headers)
                    out["shard_id"].append(sid)
                    out["record_idx"].append(idx)
                    out["uri"].append(uri)
                    out["http_status"].append(status)
                    out["html"].append(html.decode(charset, "replace"))
                    out["n_html_bytes"].append(len(html))
                    idx += 1
            yield pd.DataFrame(out)

    return shards.select("shard_id", "data").mapInPandas(
        run, WARC_RECORD_SCHEMA
    )


def synthetic_url_table(
    spark: SparkSession, n: int = 200, seed: int = 42
) -> DataFrame:
    """(url_id, url) fixture for URL canonicalization: ``n`` URLs in
    ``n // 2`` planted duplicate groups (group ``g = url_id % (n//2)``),
    where the two members differ only in canonicalization-removable
    noise — scheme/host case, explicit default port, utm_*/gclid
    tracking params (before or after the real param), fragments. The
    canonical form of every member is computable from ``g`` alone, so a
    DuckDB oracle can replay the whole parse+strip from the generative
    formula."""
    half = n // 2
    rows = []
    for i in range(n):
        g = i % half
        scheme = "http" if g % 2 == 0 else "https"
        scheme_txt = scheme.upper() if i % 2 else scheme
        host = f"www.example{g % 5}.com"
        host_txt = host.upper() if i % 2 else host
        port_txt = (
            (":80" if scheme == "http" else ":443") if i % 4 == 0 else ""
        )
        path = "/" + hashlib.md5(f"{seed}:p:{g}".encode()).hexdigest()[:8]
        realq = "q=" + hashlib.md5(f"{seed}:q:{g}".encode()).hexdigest()[:4]
        if i % 3 == 0:
            query = realq + "&utm_source=feed&utm_campaign=x"
        elif i % 3 == 1:
            junk = hashlib.md5(f"{seed}:g:{i}".encode()).hexdigest()[:6]
            query = f"gclid={junk}&" + realq
        else:
            query = realq
        frag = f"#sec{i % 3}" if i % 5 == 0 else ""
        rows.append(
            (i, f"{scheme_txt}://{host_txt}{port_txt}{path}?{query}{frag}")
        )
    return spark.createDataFrame(rows, "url_id INT, url STRING")


# Tracking parameters every crawl-curation stack strips before URL-level
# dedup (the C4/CCNet convention).
TRACKING_PARAM_REGEX = r"^(utm_[^=]*|fbclid|gclid|msclkid)="


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append a ``canonical_url`` column: scheme and host lowercased,
    explicit default port dropped (:80 for http, :443 for https),
    tracking parameters removed (remaining params keep their order —
    reordering would merge URLs whose servers treat order as
    significant), fragment dropped, empty path normalized to ``/``.
    URL-level dedup then being a plain groupBy on the canonical form.

    Pure JVM regexp work, no shuffle — at crawl scale this runs
    map-side in the ingest pass, and the dedup groupBy shuffles the
    (short) canonical string only.
    """
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[^:]+://([^/?#]+)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_extract(u, r"^[^:]+://[^/?#]+([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.regexp_extract(u, r"\?([^#]*)", 1)
    kept = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_REGEX),
    )
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(
            F.size(kept) > 0,
            F.concat(F.lit("?"), F.array_join(kept, "&")),
        ).otherwise(F.lit("")),
    )
    return df.withColumn("canonical_url", canonical)


# HTML entity decode table: each named entity plus its decimal and hex
# numeric forms, for the characters that dominate real-HTML entity use
# (&amp; alone is the overwhelming majority). ORDER MATTERS: &amp; must
# decode LAST so "&amp;lt;" yields the literal "&lt;" (HTML decodes
# once, not to a fixpoint). Numeric code points OUTSIDE this table pass
# through unchanged — the honest boundary, same policy as the
# unsupported-codec raises in multimodal.py (a general &#xNN; decoder
# needs codepoint→UTF-8 synthesis no built-in expression provides).
HTML_ENTITY_PATTERNS: list[tuple[str, str]] = [
    (r"&lt;|&#0*60;|&#[xX]0*3[cC];", "<"),
    (r"&gt;|&#0*62;|&#[xX]0*3[eE];", ">"),
    (r"&quot;|&#0*34;|&#[xX]0*22;", '"'),
    (r"&apos;|&#0*39;|&#[xX]0*27;", "'"),
    (r"&nbsp;|&#0*160;|&#[xX]0*[aA]0;", " "),
    (r"&amp;|&#0*38;|&#[xX]0*26;", "&"),  # LAST — see above
]


def strip_html_comments(col: Column) -> Column:
    """Remove ``<!-- ... -->`` comments BEFORE any tag-strip or link
    extraction. Real crawl HTML is full of commented-out markup; a
    naive ``<[^>]+>`` strip cuts only up to the first ``>`` INSIDE the
    comment and leaks the rest ("breadcrumb -->") into the "clean"
    text, and commented-out ``<a href>`` blocks would mint phantom
    link-graph edges. One JVM regexp; unterminated comments are left
    as-is (the tag-strip then degrades them the old way rather than
    eating the rest of the document)."""
    return F.regexp_replace(col, r"(?s)<!--.*?-->", " ")


def decode_html_entities(col: Column) -> Column:
    """Single-pass decode of the common HTML entities (named + numeric
    forms), pure JVM regexp chain — left in the text they pollute every
    downstream token/quality/dedup statistic (an ``&amp;`` counts as a
    symbol-ratio hit, splits shingles, inflates token counts)."""
    for pat, repl in HTML_ENTITY_PATTERNS:
        col = F.regexp_replace(col, pat, repl)
    return col


def extract_html_text(records: DataFrame) -> DataFrame:
    """HTML → clean text, entirely JVM-side (no Python in this stage):
    script/style blocks removed (their text is code, not prose), tags
    stripped to spaces, common HTML entities decoded (AFTER tag-strip,
    so a decoded ``&lt;tag&gt;`` is text, never re-stripped — the
    HTML5-correct order), whitespace collapsed, <title> extracted (and
    entity-decoded). Returns (shard_id, record_idx, uri, http_status,
    title, text_hash, n_html_bytes) — ``text_hash`` is the md5 of the
    cleaned text, so the emitted bytes (not just counts) are
    oracle-verifiable.

    The html column dies here: downstream dedup/quality stages see only
    the narrow projection, which is what keeps the post-ingest shuffle
    volume at text-scale rather than markup-scale.
    """
    h = F.col("html")
    no_blocks = F.regexp_replace(
        strip_html_comments(h), r"(?s)<(script|style)[^>]*>.*?</\1>", " "
    )
    text = F.trim(
        F.regexp_replace(
            decode_html_entities(
                F.regexp_replace(no_blocks, r"<[^>]+>", " ")
            ),
            r"\s+",
            " ",
        )
    )
    return records.select(
        "shard_id",
        "record_idx",
        "uri",
        "http_status",
        decode_html_entities(
            F.regexp_extract(h, r"<title>([^<]*)</title>", 1)
        ).alias("title"),
        F.md5(text).alias("text_hash"),
        "n_html_bytes",
    )


# Closing tags that end a text block for the main-content heuristic —
# the block-level HTML elements; splitting on them approximates the DOM
# block structure without a parser.
BLOCK_SPLIT_REGEX = (
    r"(?i)</(?:p|div|nav|footer|header|aside|section|article"
    r"|ul|ol|li|table|h[1-6])>"
)


def synthetic_boilerplate_pages(
    spark: SparkSession, n: int = 32, seed: int = 42
) -> DataFrame:
    """(page_id, html) fixture for main-content extraction: every page
    has a link-saturated <nav> and <footer> (pure boilerplate), one
    plain-prose <div>, and one prose <div> containing a short inline
    link (which a correct heuristic must KEEP — link presence alone is
    not boilerplate, link DENSITY is). Prose is md5-derived, so the
    expected main text — and its md5 — replays from the formula."""
    rows = []
    for i in range(n):
        m1 = hashlib.md5(f"{seed}:mc:{i}:1".encode()).hexdigest()
        m2 = hashlib.md5(f"{seed}:mc:{i}:2".encode()).hexdigest()
        html = (
            f"<html><head><title>Page {i}</title>"
            f"<style>a {{color: red}}</style></head><body>"
            f'<nav><a href="/">Home</a> <a href="/a">About</a> '
            f'<a href="/c">Contact</a></nav>'
            f"<div>{m1}</div>"
            f'<div>{m2} <a href="/x">ref</a></div>'
            f'<footer><a href="/p">Privacy</a> '
            f'<a href="/t">Terms</a></footer>'
            f"</body></html>"
        )
        rows.append((i, html))
    return spark.createDataFrame(rows, "page_id INT, html STRING")


def extract_main_content(
    records: DataFrame,
    html_col: str = "html",
    min_chars: int = 20,
    max_link_density: float = 0.3,
) -> DataFrame:
    """Readability-style main-content extraction, entirely JVM-side: the
    boilerplate cut production curation stacks run BETWEEN tag-strip
    and the quality ops (tag-stripping alone keeps nav/footer/sidebar
    text, which then pollutes every token/quality/dedup statistic; the
    cross-doc shingle detector catches it only statistically, after the
    damage).

    Heuristic: split the (script/style/head-free) HTML into text blocks
    at block-level closing tags; per block compute the cleaned text and
    the character mass of its <a> anchor texts; KEEP blocks with at
    least ``min_chars`` of text whose link density (link chars ÷ text
    chars) is at most ``max_link_density``. Nav bars and footers are
    nearly all anchor text → dropped; prose with an inline link → kept.
    Appends (title, n_blocks, kept_blocks, main_text, main_chars) —
    callers hash ``main_text`` for oracle replay and drop it when only
    stats are needed.

    Scale shape: one projection of per-row array folds (split /
    transform / filter / aggregate — all whole-stage-codegen
    expressions); work is bounded by document length, nothing shuffles,
    no Python. The html column should die immediately downstream, as in
    :func:`extract_html_text`.
    """
    h = F.col(html_col)
    cleaned = F.regexp_replace(
        F.regexp_replace(
            strip_html_comments(h),
            r"(?s)<(script|style)[^>]*>.*?</\1>",
            " ",
        ),
        r"(?s)<head[^>]*>.*?</head>",
        " ",
    )
    blocks = F.split(cleaned, BLOCK_SPLIT_REGEX)

    def _text(b: Column) -> Column:
        return F.trim(
            F.regexp_replace(
                decode_html_entities(
                    F.regexp_replace(b, r"<[^>]+>", " ")
                ),
                r"\s+",
                " ",
            )
        )

    def _link_chars(b: Column) -> Column:
        return F.aggregate(
            F.transform(
                F.regexp_extract_all(
                    b, F.lit(r"(?s)<a\b[^>]*>(.*?)</a>"), 1
                ),
                lambda a: F.length(_text(a)),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )

    scored = F.filter(
        F.transform(
            blocks,
            lambda b: F.struct(
                _text(b).alias("text"), _link_chars(b).alias("lc")
            ),
        ),
        lambda s: s["text"] != "",
    )
    kept = F.filter(
        scored,
        lambda s: (F.length(s["text"]) >= min_chars)
        & (
            s["lc"]
            <= F.lit(max_link_density) * F.length(s["text"])
        ),
    )
    main_text = F.array_join(
        F.transform(kept, lambda s: s["text"]), " "
    )
    return records.select(
        "*",
        decode_html_entities(
            F.regexp_extract(h, r"<title>([^<]*)</title>", 1)
        ).alias("title"),
        F.size(scored).cast("long").alias("n_blocks"),
        F.size(kept).cast("long").alias("kept_blocks"),
        main_text.alias("main_text"),
        F.length(main_text).cast("long").alias("main_chars"),
    )


def synthetic_linked_pages(
    spark: SparkSession,
    n_domains: int = 8,
    pages_per_domain: int = 6,
    seed: int = 42,
) -> DataFrame:
    """(page_id, host, html) fixture for link extraction: page ``j`` of
    domain ``k`` carries md5-derived prose plus one absolute link to
    domain ``t = (k + 1 + j % 3) % n_domains`` with anchor text
    ``site{t} page{j}`` — so the DISTINCT host-level edge set is
    exactly {k → (k+1)%D, (k+2)%D, (k+3)%D} (with pages_per_domain ≥ 3)
    and the per-target anchor-term counts are formula-replayable too.
    A relative link and a fragment link are planted on every page and
    must NOT become edges."""
    rows = []
    for k in range(n_domains):
        for j in range(pages_per_domain):
            body = hashlib.md5(f"{seed}:lp:{k}:{j}".encode()).hexdigest()
            t = (k + 1 + j % 3) % n_domains
            html = (
                f"<html><body><p>{body}</p>"
                f'<a href="https://www.example{t}.com/p{j}">'
                f"site{t} page{j}</a> "
                f'<a href="/local/page{j}">rel</a> '
                f'<a href="#sec1">frag</a>'
                # commented-out absolute link: must NOT become an edge
                # or contribute anchor terms (strip_html_comments)
                f'<!-- <a href="https://decoy{t}.example/z">ghost</a> -->'
                f"</body></html>"
            )
            rows.append(
                (k * pages_per_domain + j, f"www.example{k}.com", html)
            )
    return spark.createDataFrame(
        rows, "page_id INT, host STRING, html STRING"
    )


def extract_links(
    records: DataFrame,
    html_col: str = "html",
    host_col: str = "host",
) -> DataFrame:
    """Host-level link edges from HTML anchors: every absolute
    http(s) ``href`` becomes one (src, dst) row — src the page's host,
    dst the link target's host. Relative links and fragments are
    dropped (host-graph analyses want cross-site structure; resolving
    relative hrefs would only add self-edges). Pure JVM
    regexp_extract_all + explode; work is bounded by anchor count,
    nothing shuffles here.

    This is the input to the domain-graph family (PageRank for
    authority-weighted crawl prioritization, LPA for site communities)
    — at crawl scale the (src, dst) distinct is the only shuffle, keyed
    on the short host strings."""
    hrefs = F.regexp_extract_all(
        strip_html_comments(F.col(html_col)),
        F.lit(r'<a\b[^>]*href="([^"#]+)"'),
        1,
    )
    out = records.select(
        F.col(host_col).alias("src"),
        F.explode(hrefs).alias("href"),
    ).filter(F.col("href").rlike(r"^https?://"))
    return out.select(
        "src",
        F.regexp_extract("href", r"^[^:]+://([^/?#:]+)", 1).alias("dst"),
    )


def extract_anchor_terms(
    records: DataFrame, html_col: str = "html"
) -> DataFrame:
    """(dst, term) rows: the lowercased anchor-text terms of every
    absolute http(s) link, keyed by the TARGET host — the classic
    link-based retrieval/quality signal (how the web describes a page
    beats how the page describes itself; anchor text feeds ranking and
    query-independent quality features). Tags inside the anchor are
    stripped and entities decoded with the shared chain.

    Pure JVM: extract whole anchor elements, per-element pull href and
    inner text, explode to terms. At crawl scale the only shuffle is
    the (dst, term) count — short strings, map-side combined."""
    anchors = F.regexp_extract_all(
        strip_html_comments(F.col(html_col)),
        F.lit(r'(?s)<a\b[^>]*href="https?://[^"#]+"[^>]*>.*?</a>'),
        0,
    )
    a = records.select(F.explode(anchors).alias("a"))
    dst = F.regexp_extract("a", r'href="[^:]+://([^/?#:"]+)', 1)
    inner = F.trim(
        F.regexp_replace(
            decode_html_entities(
                F.regexp_replace(
                    F.regexp_extract("a", r"(?s)>(.*)</a>$", 1),
                    r"<[^>]+>",
                    " ",
                )
            ),
            r"\s+",
            " ",
        )
    )
    return (
        a.select(dst.alias("dst"), F.lower(inner).alias("text"))
        .select(
            "dst",
            F.explode(
                F.filter(F.split("text", " "), lambda t: t != "")
            ).alias("term"),
        )
    )


def host_suffix_chain(host: Column) -> Column:
    """All dot-suffix chains of a hostname: ``a.b.c`` →
    [``a.b.c``, ``b.c``, ``c``] — bounded by the label count (a handful),
    never by corpus size. Turning suffix MATCHING into suffix EQUALITY
    is what lets a blocklist join stay an equi-join: a LIKE/endswith
    predicate against a blocklist would be a theta-join (broadcast
    nested loop — fine for 10 domains, dead at a million-domain
    blocklist), while the exploded chain joins hash-partitioned on the
    suffix key at ANY blocklist size."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(parts, i + 1, n), "."),
    )


def domain_blocklist_filter(
    urls: DataFrame,
    blocklist: DataFrame,
    url_col: str = "canonical_url",
) -> DataFrame:
    """Append (host, blocked) to a URL frame: blocked iff the host
    equals a blocklisted domain or is a subdomain of one (the public-
    suffix-style rule every crawl-curation stack applies before
    fetching). ``blocklist`` is a (domain) DataFrame.

    Scale shape: host extraction is a map; the suffix chain explode
    multiplies rows by the label count (~4) only for the duration of
    one equi-join on the suffix key (broadcast when the blocklist is
    small, plain hash join when it is web-scale); the verdict collapses
    back to URL granularity via a distinct + left join flag. No
    broadcast hint is forced: AQE broadcasts a small build side on its
    own, and a public-suffix-scale (million-domain) blocklist must be
    free to plan as a shuffled hash join — a hard-coded hint would
    instruct the planner to broadcast something too big to broadcast."""
    host = F.regexp_extract(F.col(url_col), r"^[^:]+://([^/?#:]+)", 1)
    with_host = urls.withColumn("host", host)
    hits = (
        with_host.select("url_id", F.explode(
            host_suffix_chain(F.col("host"))
        ).alias("suffix"))
        .join(
            blocklist,
            F.col("suffix") == F.col("domain"),
            "leftsemi",
        )
        .select("url_id")
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    return (
        with_host.join(hits, "url_id", "left")
        .withColumn("blocked", F.col("__hit").isNotNull())
        .drop("__hit")
    )


def synthetic_robots_table(
    spark: SparkSession, n_domains: int = 5
) -> DataFrame:
    """(domain, robots_txt) fixture: each domain's robots.txt is built
    from the generative formula — a directory disallow, a global /tmp/
    disallow, a LONGER allow carving a public subtree back out of the
    disallowed directory (the rule-precedence case that separates
    longest-match semantics from first-match), plus RFC 9309 §2.2.3
    wildcard rules: a ``/*.tmp$`` extension disallow (exercising both
    ``*`` and the ``$`` end anchor) and an allow/disallow pair on
    /downloads/ where the longer wildcard ALLOW outranks the directory
    disallow. A trailing ``User-agent: badbot / Disallow: /`` decoy
    group and an ungrouped leading Disallow must BOTH be ignored by a
    ``*`` crawler (RFC 9309 §2.2.1 group selection) — the decoy would
    flip every URL to blocked, the ungrouped rule would flip the
    unruled /docs/ branch; the oracle catches either leak."""
    rows = []
    for k in range(n_domains):
        # The two Sitemap lines probe GROUP-INDEPENDENCE: one sits
        # before any User-agent line (where grouped directives are
        # dropped), one inside the badbot decoy group (whose
        # Allow/Disallow a '*' crawler ignores) — extract_sitemaps
        # must surface BOTH; parse_robots must surface NEITHER.
        txt = (
            "Disallow: /docs/\n"
            f"Sitemap: https://www.example{k}.com/sitemap.xml\n"
            "User-agent: *\n"
            f"Disallow: /private{k}/\n"
            "Disallow: /tmp/\n"
            f"Allow: /private{k}/public/\n"
            "Disallow: /*.tmp$\n"
            "Disallow: /downloads/\n"
            "Allow: /downloads/*.html$\n"
            "Crawl-delay: 5\n"
            "\n"
            "User-agent: badbot\n"
            "Disallow: /\n"
            f"sitemap: https://cdn.example{k}.com/sm/news.xml\n"
        )
        rows.append((f"www.example{k}.com", txt))
    return spark.createDataFrame(rows, "domain STRING, robots_txt STRING")


def synthetic_crawl_frontier(
    spark: SparkSession, n_domains: int = 5, per_kind: int = 4
) -> DataFrame:
    """(url_id, url) frontier fixture: per domain, URLs in the
    disallowed directory, in its allowed public subtree, under the
    global /tmp/ disallow, on an unruled path, hit by the ``/*.tmp$``
    wildcard disallow, carved back out by the ``/downloads/*.html$``
    wildcard allow, and just PAST the ``$`` anchor (``.tmpx`` — must
    NOT match ``/*.tmp$``) — every precedence branch of the robots
    decision including the wildcard ones, all regenerable from the
    formula. url_id = ((domain*7 + kind) * per_kind) + i."""
    kinds = [
        "/private{k}/secret{i}",
        "/private{k}/public/page{i}",
        "/tmp/cache{i}",
        "/docs/page{i}",
        "/files/doc{i}.tmp",
        "/downloads/page{i}.html",
        "/files/doc{i}.tmpx",
    ]
    rows = []
    for k in range(n_domains):
        for kind, pat in enumerate(kinds):
            for i in range(per_kind):
                rows.append(
                    (
                        (k * len(kinds) + kind) * per_kind + i,
                        f"https://www.example{k}.com"
                        + pat.format(k=k, i=i),
                    )
                )
    return spark.createDataFrame(rows, "url_id INT, url STRING")


def _robots_selected_lines(
    robots: DataFrame, user_agent: str
) -> DataFrame:
    """(domain, rule, value) directive lines belonging to the RFC 9309
    §2.2.1 SELECTED group(s) for ``user_agent``: lines split into
    groups (consecutive ``User-agent`` lines open a group; its
    directives run until the next group); the groups naming the
    crawler's product token are selected, with the ``*`` groups as the
    fallback only when no specific group exists on that domain. Lines
    before any ``User-agent`` line belong to no group and are dropped.

    Pure JVM string work over the robots relation; a robots file is
    KB-sized, so the per-domain line window and every frame here are
    |domains|·|lines| tiny regardless of frontier size."""
    from pyspark.sql.window import Window

    lines = robots.select(
        "domain",
        F.posexplode(F.split(F.col("robots_txt"), "\n")).alias(
            "pos", "line"
        ),
    )
    rule = F.lower(F.trim(F.regexp_extract("line", r"^([A-Za-z-]+):", 1)))
    value = F.trim(F.regexp_extract("line", r"^[A-Za-z-]+:(.*)$", 1))
    w = Window.partitionBy("domain").orderBy("pos")
    is_ua = rule == "user-agent"
    # a group opens at a User-agent line not directly preceded by one
    # (consecutive UA lines share the group, RFC 9309 §2.2.1)
    group_start = is_ua & ~F.coalesce(
        F.lag(is_ua).over(w), F.lit(False)
    )
    base = lines.select(
        "domain",
        "pos",
        rule.alias("rule"),
        value.alias("value"),
        F.sum(group_start.cast("int")).over(w).alias("grp"),
    )
    uas = (
        base.filter(F.col("rule") == "user-agent")
        .groupBy("domain", "grp")
        .agg(F.collect_set(F.lower(F.col("value"))).alias("uas"))
        .select(
            "domain",
            "grp",
            F.array_contains("uas", user_agent.lower()).alias("specific"),
            F.array_contains("uas", "*").alias("generic"),
        )
    )
    has_specific = uas.groupBy("domain").agg(
        F.max(F.col("specific").cast("int")).alias("__has_spec")
    )
    return (
        base.filter(F.col("rule") != "user-agent")
        .join(uas, on=["domain", "grp"])  # ungrouped lines drop here
        .join(has_specific, on="domain")
        .filter(
            F.when(F.col("__has_spec") == 1, F.col("specific")).otherwise(
                F.col("generic")
            )
        )
        .select("domain", "rule", "value")
    )


def parse_robots(robots: DataFrame, user_agent: str = "*") -> DataFrame:
    """robots.txt → (domain, rule, prefix): the Allow/Disallow rules of
    the RFC 9309-selected group(s) (:func:`_robots_selected_lines`),
    empty prefixes dropped (an empty Disallow permits everything — no
    rule needed), other directives ignored."""
    sel = _robots_selected_lines(robots, user_agent)
    return (
        sel.filter(F.col("rule").isin("allow", "disallow"))
        .filter(F.col("value") != "")
        .select("domain", "rule", F.col("value").alias("prefix"))
    )


def extract_sitemaps(robots: DataFrame) -> DataFrame:
    """robots.txt → (domain, sitemap_url): every ``Sitemap:`` directive,
    which per the sitemaps.org protocol (and RFC 9309 §2.2.4 "other
    records") is GLOBAL — independent of user-agent groups, valid
    before any ``User-agent`` line and equally valid inside someone
    else's group — so this deliberately does NOT route through the
    group-selection machinery that Allow/Disallow/Crawl-delay use.
    Only absolute http(s) URLs qualify (the protocol requires full
    URLs); duplicates collapse.

    This is the frontier-DISCOVERY input that complements
    :func:`robots_filter` (enforcement): a crawler seeds per-domain
    sitemap fetches from exactly this relation. Pure JVM split +
    regexp over the KB-sized robots relation; nothing heavy shuffles.
    """
    lines = robots.select(
        "domain",
        F.explode(F.split(F.col("robots_txt"), "\n")).alias("line"),
    )
    url = F.trim(
        F.regexp_extract("line", r"(?i)^\s*sitemap\s*:(.*)$", 1)
    )
    return (
        lines.select("domain", url.alias("sitemap_url"))
        .filter(F.col("sitemap_url").rlike(r"^https?://"))
        .distinct()
    )


def parse_crawl_delays(
    robots: DataFrame,
    user_agent: str = "*",
    default_delay: float = 1.0,
) -> DataFrame:
    """robots.txt → (domain, crawl_delay) in seconds for the selected
    group(s): the MINIMUM numeric Crawl-delay among the selected lines
    (the conservative read when several apply), non-numeric values
    ignored, ``default_delay`` where the domain declares none. One row
    per robots-bearing domain — the politeness input to
    :func:`frontier_fetch_plan`."""
    sel = _robots_selected_lines(robots, user_agent)
    declared = (
        sel.filter(F.col("rule") == "crawl-delay")
        # try_cast: a malformed delay ("soon") is an ignorable line, not
        # a query-aborting ANSI cast error
        .select("domain", F.col("value").try_cast("double").alias("d"))
        .filter(F.col("d").isNotNull() & (F.col("d") >= 0))
        .groupBy("domain")
        .agg(F.min("d").alias("__declared"))
    )
    return (
        robots.select("domain")
        .distinct()
        .join(declared, on="domain", how="left")
        .select(
            "domain",
            F.coalesce(F.col("__declared"), F.lit(default_delay)).alias(
                "crawl_delay"
            ),
        )
    )


def frontier_fetch_plan(
    urls: DataFrame,
    delays: DataFrame,
    default_delay: float = 1.0,
) -> DataFrame:
    """Politeness schedule for a crawl frontier: per domain, URLs get
    deterministic fetch slots (ordered by url_id) spaced by the
    domain's Crawl-delay — slot k fetches at offset (k-1)·delay
    seconds. Returns (url_id, url, domain, slot, fetch_offset_s).
    Unknown domains (no robots row) fall back to ``default_delay``.

    Scale shape: ONE window partitioned by domain (millions of small
    per-host groups — exactly the partitioning a distributed fetcher
    wants; no global sort anywhere) and a broadcast-sized join against
    the per-domain delay table. The plan IS the work assignment: a
    fetcher fleet partitioned by domain consumes each group's slots in
    order and politeness is preserved per host no matter how many
    workers run."""
    from pyspark.sql.window import Window

    host = F.regexp_extract("url", r"^[^:]+://([^/?#:]+)", 1)
    u = urls.select("url_id", "url", host.alias("domain"))
    w = Window.partitionBy("domain").orderBy("url_id")
    return (
        u.join(F.broadcast(delays), on="domain", how="left")
        .withColumn(
            "crawl_delay",
            F.coalesce(F.col("crawl_delay"), F.lit(default_delay)),
        )
        .select(
            "url_id",
            "url",
            "domain",
            F.row_number().over(w).alias("slot"),
            (
                (F.row_number().over(w) - 1) * F.col("crawl_delay")
            ).alias("fetch_offset_s"),
        )
    )


def robots_rule_regex(prefix: Column) -> Column:
    """RFC 9309 §2.2.3 rule path → anchored Java regex: regex metachars
    escaped, ``*`` → ``.*`` (matches any char sequence), a TRAILING
    ``$`` → end-of-path anchor (a mid-pattern ``$`` stays literal, the
    Google-parser convention). Callers prepend ``^`` — rule paths match
    from the start of the URL path. Computed over the rules frame only
    (KB-sized), never over the frontier."""
    esc = F.regexp_replace(
        prefix, r"([\\.\[\]\{\}\(\)\+\?\^\$\|])", r"\\$1"
    )
    star = F.regexp_replace(esc, r"\*", ".*")
    return F.regexp_replace(star, r"\\\$$", r"\$")


def robots_filter(urls: DataFrame, rules: DataFrame) -> DataFrame:
    """Longest-match robots decision per URL (the Google/RFC 9309
    semantics, including §2.2.3 ``*`` and ``$`` wildcards): among the
    domain's rules matching the URL's path — each rule path translated
    to an anchored regex by :func:`robots_rule_regex` — the rule with
    the LONGEST raw pattern text wins (octet-length specificity, so
    ``/downloads/*.html$`` outranks ``/downloads/``); a length tie goes
    to allow; no matching rule means allowed. Returns
    (url_id, url, allowed, matched_prefix — the winning rule's raw
    pattern, NULL when unruled).

    Scale shape: the rules relation is tiny (robots files are KB), so
    the join is an equi-join on the domain key with the regex match as
    a post-join predicate over that domain's handful of rules —
    broadcast at any frontier size; the winner is one
    max_by(struct(len, is_allow, prefix)) aggregate keyed on the URL.
    No LIKE theta-join against the frontier ever plans."""
    host = F.regexp_extract("url", r"^[^:]+://([^/?#:]+)", 1)
    path = F.regexp_extract("url", r"^[^:]+://[^/?#]+([^?#]*)", 1)
    u = urls.select(
        "url_id",
        "url",
        host.alias("domain"),
        F.when(path == "", F.lit("/")).otherwise(path).alias("path"),
    )
    rules = rules.withColumn(
        "__rule_re",
        F.concat(F.lit("^"), robots_rule_regex(F.col("prefix"))),
    )
    cand = u.join(F.broadcast(rules), "domain", "left").withColumn(
        "hit",
        F.col("prefix").isNotNull()
        & F.rlike(F.col("path"), F.col("__rule_re")),
    )
    win = F.max_by(
        F.struct(
            (F.col("rule") == "allow").alias("is_allow"),
            F.col("prefix").alias("p"),
        ),
        F.when(
            F.col("hit"),
            F.struct(
                F.length("prefix").alias("ln"),
                (F.col("rule") == "allow").cast("int").alias("ia"),
                F.col("prefix").alias("pf"),
            ),
        ),
    )
    agg = cand.groupBy("url_id", "url").agg(
        win.alias("w"),
        F.max(F.when(F.col("hit"), 1).otherwise(0)).alias("any_hit"),
    )
    return agg.select(
        "url_id",
        "url",
        F.when(F.col("any_hit") == 0, F.lit(True))
        .otherwise(F.col("w.is_allow"))
        .alias("allowed"),
        F.when(F.col("any_hit") == 1, F.col("w.p")).alias(
            "matched_prefix"
        ),
    )


def synthetic_sitemap_table(
    spark: SparkSession, n_domains: int = 6
) -> DataFrame:
    """(domain, sitemap_url, sitemap_xml) fixture: even domains serve a
    ``<urlset>`` (page entries), odd domains a ``<sitemapindex>``
    (child-sitemap references — frontier EXPANSION, not page URLs).
    Adversarial plants the parser must survive: an XML comment holding
    a decoy ``<url><loc>`` (must not surface), a loc wrapped in
    whitespace/newlines (must be trimmed), a relative loc (protocol
    requires absolute http(s) — must be dropped), and lastmod present
    on only some entries (nullable passthrough)."""
    rows = []
    for k in range(n_domains):
        domain = f"www.example{k}.com"
        if k % 2 == 0:
            xml = (
                '<?xml version="1.0" encoding="UTF-8"?>\n'
                "<urlset "
                'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
                f"  <!-- retired: <url><loc>https://evil.example/old{k}"
                "</loc></url> -->\n"
                f"  <url><loc>https://www.example{k}.com/</loc>"
                f"<lastmod>2026-01-{k + 1:02d}</lastmod>"
                "<priority>0.8</priority></url>\n"
                "  <url>\n    <loc>\n"
                f"      https://www.example{k}.com/products/p{k}\n"
                "    </loc>\n  </url>\n"
                f"  <url><loc>/relative/path{k}</loc></url>\n"
                f"  <url><loc>https://www.example{k}.com/news</loc></url>\n"
                "</urlset>\n"
            )
        else:
            xml = (
                '<?xml version="1.0" encoding="UTF-8"?>\n'
                "<sitemapindex "
                'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
                f"  <sitemap><loc>https://www.example{k}.com/sitemap-a.xml"
                f"</loc><lastmod>2026-02-{k + 1:02d}</lastmod></sitemap>\n"
                f"  <sitemap>\n<loc>https://cdn.example{k}.com/sitemap-b.xml"
                "</loc>\n</sitemap>\n"
                "</sitemapindex>\n"
            )
        rows.append((domain, f"https://www.example{k}.com/sitemap.xml", xml))
    return spark.createDataFrame(
        rows, "domain STRING, sitemap_url STRING, sitemap_xml STRING"
    )


def parse_sitemap_entries(
    sitemaps: DataFrame, xml_col: str = "sitemap_xml"
) -> DataFrame:
    """Sitemap XML → (domain, kind, loc, lastmod): the fetch stage after
    :func:`extract_sitemaps` discovers the sitemap URLs. ``kind`` is
    'urlset' (entries are page URLs for the frontier) or 'index'
    (entries are MORE sitemaps — the crawler recurses, it must not
    enqueue them as pages; conflating the two poisons the frontier with
    XML fetches). Per sitemaps.org: only absolute http(s) locs qualify
    (relative locs dropped), surrounding whitespace trimmed, lastmod
    passed through when present (null otherwise). XML comments are
    stripped first — commented-out entries are real in retired
    sitemaps and must not resurface.

    Shape: pure JVM regexp work — comment strip, one dotall
    ``<url>/<sitemap>`` element extract + explode, two per-element
    field extracts. Per-row cost is bounded by the 50k-entry protocol
    cap on sitemap files; shards of sitemap documents parallelize as
    rows. No Python, no shuffle beyond the explode."""
    body = strip_html_comments(F.col(xml_col))
    kind = (
        F.when(body.rlike(r"(?s)<\s*sitemapindex\b"), F.lit("index"))
        .when(body.rlike(r"(?s)<\s*urlset\b"), F.lit("urlset"))
        .otherwise(F.lit(None).cast("string"))
    )
    elems = F.regexp_extract_all(
        body,
        F.lit(r"(?s)<(?:url|sitemap)\b[^>]*>(.*?)</(?:url|sitemap)>"),
        1,
    )
    exploded = (
        sitemaps.select(
            "domain",
            kind.alias("kind"),
            F.explode(elems).alias("elem"),
        )
        .filter(F.col("kind").isNotNull())
    )
    # \s* INSIDE the pattern, not trim(): SQL trim strips spaces only,
    # and multiline locs are newline-wrapped
    loc = F.regexp_extract(
        "elem", r"(?s)<loc\s*>\s*(.*?)\s*</loc>", 1
    )
    lastmod = F.nullif(
        F.regexp_extract(
            "elem", r"(?s)<lastmod\s*>\s*(.*?)\s*</lastmod>", 1
        ),
        F.lit(""),
    )
    return (
        exploded.select(
            "domain",
            "kind",
            loc.alias("loc"),
            lastmod.alias("lastmod"),
        )
        .filter(F.col("loc").rlike(r"^https?://"))
    )
