"""Text-analysis column expressions for large-scale document pipelines.

Beyond-reference extension surface (north-star scope, SURVEY §2.11): the
operations a training-data pipeline runs over a `documents` table at 100 TB.
Everything here is a native column expression (JVM-side, codegen-friendly) —
no Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Small English stopword list for ratio features (top function words).
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be", "this",
]

#: BPE-ish token pattern: words with contractions, numbers, or single
#: non-space symbols — a practical approximation of subword pre-tokenizers.
TOKEN_PATTERN = r"[A-Za-z]+(?:'[A-Za-z]+)?|[0-9]+|[^\sA-Za-z0-9]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens_expr(text: Column | str, pattern: str = TOKEN_PATTERN) -> Column:
    """ARRAY<STRING> of regex tokens."""
    return F.regexp_extract_all(_c(text), F.lit(pattern), 0)


def token_count_expr(text: Column | str) -> Column:
    """Regex token count (BPE-ish proxy for LLM token budgeting)."""
    return F.size(tokens_expr(text)).cast("long")


def whitespace_token_count_expr(text: Column | str) -> Column:
    """Whitespace-split token count."""
    t = F.trim(_c(text))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def words_expr(text: Column | str) -> Column:
    """Lowercased alphabetic words."""
    return F.regexp_extract_all(F.lower(_c(text)), F.lit(r"[a-z]+"), 0)


def word_ngrams_expr(text: Column | str, n: int = 3) -> Column:
    """ARRAY<STRING> of space-joined word n-grams (shingles). Texts with
    fewer than n words yield an empty array (guarded: Spark's
    sequence(1, 0) counts DOWN, it is not empty). The token array is bound
    once (`bound_expr`) — slice-per-index must not re-tokenize."""
    w = words_expr(text)
    return bound_expr(
        w,
        lambda ww: F.when(
            F.size(ww) < n, F.array().cast("array<string>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(ww) - (n - 1)),
                lambda i: F.array_join(F.slice(ww, i, n), " "),
            )
        ),
    )



def bound_expr(expr: Column, fn) -> Column:
    """Evaluate `expr` ONCE and pass it to `fn` as a HOF lambda variable.

    A non-lambda subexpression captured inside a higher-order-function
    lambda is re-evaluated on EVERY element (HOF bodies run interpreted,
    no common-subexpression elimination): `transform(idx, i ->
    slice(shingles, i, k))` recomputes the whole `shingles` subtree per
    window — quadratic in document length (measured: the winnowing catalog
    entry spent 97 s at sf0.01 before this, 3 s after). Wrapping the
    subtree as the single element of an array and binding it as the outer
    transform's lambda variable forces one evaluation; `getItem(0)`
    unwraps."""
    return F.transform(F.array(expr), fn).getItem(0)

def char_shingles_expr(text: Column | str, k: int = 5) -> Column:
    """ARRAY<STRING> of lowercase character k-shingles (whitespace collapsed).
    Texts shorter than k chars yield an empty array. The normalized text is
    bound once (`bound_expr`) — substr-per-index must not re-run the
    normalization regex per shingle."""
    t = F.regexp_replace(F.lower(_c(text)), r"\s+", " ")
    return bound_expr(
        t,
        lambda tt: F.when(
            F.length(tt) < k, F.array().cast("array<string>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.length(tt) - (k - 1)),
                lambda i: tt.substr(i, F.lit(k)),
            )
        ),
    )


def punct_ratio_expr(text: Column | str) -> Column:
    """Fraction of non-space characters that are punctuation/symbols."""
    t = F.regexp_replace(_c(text), r"\s+", "")
    n = F.length(t)
    p = F.length(F.regexp_replace(t, r"[A-Za-z0-9]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(p / n.cast("double"))


def stopword_ratio_expr(text: Column | str) -> Column:
    """Fraction of alphabetic words that are English stopwords."""
    w = words_expr(text)
    sw = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    return F.when(F.size(w) == 0, F.lit(0.0)).otherwise(
        sw / F.size(w).cast("double")
    )


def mean_word_len_expr(text: Column | str) -> Column:
    w = words_expr(text)
    return F.when(F.size(w) == 0, F.lit(0.0)).otherwise(
        F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
        / F.size(w).cast("double")
    )


def quality_score_expr(text: Column | str) -> Column:
    """Composite [0,1] document-quality heuristic: length band, sane mean
    word length, moderate punctuation, nonzero stopword density (prose
    signal). Deterministic and SQL-mirrorable for oracle checks."""
    t = _c(text)
    n = F.length(t)
    len_score = F.when((n >= 100) & (n <= 20000), 1.0).when(n >= 20, 0.5).otherwise(0.0)
    mwl = mean_word_len_expr(t)
    wl_score = F.when((mwl >= 3.0) & (mwl <= 10.0), 1.0).otherwise(0.0)
    punct_score = F.when(punct_ratio_expr(t) <= 0.2, 1.0).otherwise(0.0)
    stop_score = F.when(stopword_ratio_expr(t) >= 0.05, 1.0).otherwise(0.0)
    return (len_score + wl_score + punct_score + stop_score) / F.lit(4.0)


def lang_id_expr(text: Column | str) -> Column:
    """Cheap language-ID heuristic over function-word hit rates. Returns the
    best of {en, de, fr, es} or 'und' when nothing matches. Designed for
    obvious cases (the synthetic corpus); real pipelines swap in a model —
    the operator shape (pure column expr, no shuffle) is the point."""
    markers = {
        "en": ["the", "and", "of", "to", "is", "with"],
        "de": ["der", "die", "und", "das", "ist", "nicht"],
        "fr": ["le", "la", "les", "et", "est", "une"],
        "es": ["el", "los", "las", "es", "una", "que"],
    }
    w = words_expr(text)

    def _hits(ms):
        # one-arg lambda: a two-arg lambda would make F.filter pass the
        # element index as the second argument
        return F.size(F.filter(w, lambda x: x.isin(*ms)))

    score = {lang: _hits(ms) for lang, ms in markers.items()}
    # Deterministic tie precedence en > de > fr > es (mirrors the SQL oracle
    # exactly — no reliance on struct-comparison ordering).
    en, de, fr, es = score["en"], score["de"], score["fr"], score["es"]
    return (
        F.when((en >= de) & (en >= fr) & (en >= es) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de >= es) & (de > 0), F.lit("de"))
        .when((fr >= es) & (fr > 0), F.lit("fr"))
        .when(es > 0, F.lit("es"))
        .otherwise(F.lit("und"))
    )


def winnowing_fingerprints_expr(
    text: Column | str, k: int = 5, window: int = 4, portable: bool = False
) -> Column:
    """ARRAY<BIGINT> winnowing fingerprint set (Schleimer et al., MOSS):
    hash every character k-shingle (rolling window over the normalized
    text), then keep the minimum hash of each `window`-length run —
    guaranteeing two documents sharing a run of >= k+window-1 characters
    share a fingerprint. The standard plagiarism/near-dup sketch whose size
    adapts to document length.

    Pure nested HOFs over a per-row array — the shingle hash array is built
    once (single transform), window minima slice it.

    portable: hash shingles with the 31-bit polynomial family
    (`poly_hash_expr`) instead of xxhash64 — ANSI-reproducible, which is
    what lets the catalog entry carry an exact SQL oracle (the same move
    that gave SimHash its oracle). Default stays xxhash64: better
    dispersion, fine whenever fingerprints only meet other fingerprints
    from the same engine."""
    sh = char_shingles_expr(text, k)
    if portable:
        hashes = F.transform(sh, lambda s: poly_hash_expr(s))
    else:
        hashes = F.transform(sh, lambda s: F.xxhash64(s))
    # Bind the hash array once: slice-per-window over a CAPTURED `hashes`
    # re-hashes the whole document per window (quadratic; measured 97 s ->
    # 3 s on the winnowing catalog entry at sf0.01).
    mins = bound_expr(
        hashes,
        lambda hh: F.when(
            F.size(hh) == 0, F.array().cast("array<bigint>")
        )
        .when(F.size(hh) - (window - 1) <= 0, F.array(F.array_min(hh)))
        .otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(hh) - (window - 1)),
                lambda i: F.array_min(F.slice(hh, i, window)),
            )
        ),
    )
    return F.array_distinct(mins)


#: Largest 31-bit Mersenne prime — modulus of the portable hash family.
POLY_MOD = (1 << 31) - 1


def poly_hash_expr(s: Column | str, p: int = POLY_MOD) -> Column:
    """Portable 31-bit polynomial string hash as BIGINT: fold
    ``(acc * 31 + code_point) mod p`` over the characters.

    Three arithmetic ops per character, and — unlike xxhash64 — exactly
    reproducible in ANSI SQL (DuckDB twin:
    ``list_reduce(list_prepend(0, list_transform(string_split(s, ''),
    c -> ascii(c))), (acc, c) -> (acc * 31 + c) % p)``), which is what lets
    hash-keyed operators built on it keep an exact external oracle. All
    intermediates stay below 2^36 (acc < 2^31), so the fold is safe under
    ANSI overflow checking on both engines."""
    return F.aggregate(
        F.transform(F.split(_c(s), ""), lambda c: F.ascii(c).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(31).cast("long") + c) % F.lit(p).cast("long"),
    )


def fingerprint_expr(text: Column | str) -> Column:
    """64-bit document fingerprint: xxhash64 over the whitespace/case
    normalized text. Identical normalized content -> identical fingerprint;
    an exact-dedup key that's robust to whitespace noise."""
    norm = F.trim(F.regexp_replace(F.lower(_c(text)), r"\s+", " "))
    return F.xxhash64(norm)


#: (kind, pattern, replacement) — patterns restricted to the Java-regex ∩
#: RE2 common dialect (no lookaround, no backrefs) so the SAME literal
#: pattern runs in Spark and any RE2 engine (DuckDB oracle) identically.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("phone", r"\+?[0-9][0-9()\-\s]{6,}[0-9]", "<PHONE>"),
]


def redact_pii_expr(text: Column | str, kinds: tuple = ("email", "url", "phone")) -> Column:
    """Replace emails / URLs / phone-ish numbers with typed placeholder
    tokens — the standard PII scrub a training-data pipeline runs before
    anything else. Pure chained regexp_replace: JVM-side, order fixed
    (email before phone so the digits inside a mailbox never half-match).
    """
    out = _c(text)
    wanted = set(kinds)
    for kind, pat, rep in PII_PATTERNS:
        if kind in wanted:
            out = F.regexp_replace(out, pat, rep)
    return out


def chunk_windows_expr(
    text: Column | str, size: int = 50, stride: int | None = None
) -> Column:
    """ARRAY<STRING> of token-window chunks: whitespace tokens sliced into
    windows of `size` tokens every `stride` tokens (stride < size =
    overlapping windows — the standard context-window chunking for
    training/embedding pipelines). A document shorter than one window
    yields exactly one chunk; empty text yields none. Pure HOF expression:
    sequence over window starts -> slice -> array_join, no Python, no
    explode until the caller asks (pair with posexplode for
    (chunk_idx, chunk) rows)."""
    stride = stride or size
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    # token array bound once (`bound_expr`): slicing per window over a
    # captured token expr would re-tokenize the document per chunk
    return bound_expr(
        words_expr(text),
        lambda toks: F.when(
            F.size(toks) <= 0, F.array().cast("array<string>")
        ).otherwise(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        F.floor((F.size(toks).cast("double") - 1) / stride)
                        .cast("int"),
                        F.lit(0),
                    ),
                ),
                lambda i: F.array_join(
                    F.slice(toks, i * stride + 1, size), " "
                ),
            )
        ),
    )


def mix32_expr(h: Column) -> Column:
    """Avalanche finalizer over a non-negative 32-bit-range BIGINT (the
    public xor-shift-multiply integer hash, Wellons' lowbias32 family):

        x = ((h XOR h div 2^16) * 73244475) mod 2^32   — twice —
        x =   x XOR x div 2^16

    The polynomial hash's Knuth scramble is a BIJECTION onto a Weyl
    sequence — equidistributed, which order-statistics consumers (KMV,
    sampling) want, but systematically missing the extreme gaps that
    leading-zero statistics (HyperLogLog's rho) are made of. This mixer
    avalanches instead: each output bit depends on every input bit.
    Integer-division shifts and a 27-bit multiplier keep every
    intermediate below 2^59 (ANSI-overflow-safe) and the whole chain
    reproducible in ANSI SQL (DuckDB twin: xor(x, x // 65536) etc.)."""
    x = h.cast("long")
    for _ in range(2):
        x = (
            x.bitwiseXOR(F.floor(x / F.lit(65536)).cast("long"))
            * F.lit(73244475)
        ) % F.lit(4294967296)
    return x.bitwiseXOR(F.floor(x / F.lit(65536)).cast("long"))


#: (name, pattern, replacement) applied IN ORDER — restricted to the
#: Java-regex ∩ RE2 common dialect (the PII_PATTERNS discipline: no
#: lookaround, no backrefs) so the SAME literals run identically in
#: Spark and the DuckDB oracle. Order matters: script/style bodies
#: must vanish before generic tags, entities after tags (so "&lt;p&gt;"
#: decodes to a literal "<p>" TEXT, never becomes a strippable tag).
HTML_STRIP_STEPS = [
    ("comment", r"<!--[\s\S]*?-->", " "),
    ("script", r"(?i)<script[\s\S]*?</script\s*>", " "),
    ("style", r"(?i)<style[\s\S]*?</style\s*>", " "),
    ("tag", r"<[^>]+>", " "),
    ("amp_lt", r"&lt;", "<"),
    ("amp_gt", r"&gt;", ">"),
    ("amp_nbsp", r"&nbsp;", " "),
    ("amp_quot", r"&quot;", "\""),
    ("amp_apos", r"&#39;", "'"),
    ("amp_amp", r"&amp;", "&"),
    ("ws", r"\s+", " "),
]


def html_text_expr(html: Column | str) -> Column:
    """Extract visible text from HTML — the first transformation every
    web-crawl pipeline applies (the trafilatura/jusText job, in its
    deterministic regex-core form): drop comments, script and style
    BODIES (their content is code, not text), strip remaining tags,
    decode the six dominant entities, collapse whitespace, trim. Pure
    chained regexp_replace — JVM-side, zero Python, and every pattern
    sits in the Java∩RE2 dialect so the SQL oracle replays the
    identical literals (the PII_PATTERNS discipline).

    This is the honest 95% extractor, not a DOM parser: malformed
    nesting degrades to extra whitespace, never to an exception —
    the property that matters at 100 TB, where one exotic page must
    not kill an executor. Boilerplate REMOVAL (nav/footer pruning) is
    a separate, model-or-frequency-based stage (`boilerplate_stats`)."""
    out = _c(html)
    for _, pat, rep in HTML_STRIP_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


#: query parameters stripped by url_normalize_expr — the tracking
#: decorations that make one page look like many (the crawl-dedup
#: canonicalization list; extend per corpus).
URL_TRACKING_PARAMS_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="


def url_normalize_expr(url: Column | str) -> Column:
    """Canonicalize a URL for crawl deduplication — the normalization
    under which `http://WWW.Example.com:80/a/?utm_source=x&b=2&a=1#f`
    and `http://example.com/a?a=1&b=2` are the SAME page:

      * fragment dropped (never sent to the server);
      * scheme + host lowercased; leading `www.` and default ports
        (:80, :443) dropped;
      * trailing path slashes dropped (path case PRESERVED — many
        servers are case-sensitive);
      * tracking parameters removed (URL_TRACKING_PARAMS_RE), the
        REMAINING query parameters sorted so parameter order can't
        split a dedup group; an emptied query drops its '?'.

    Pure native expressions (regexp + array HOFs), engine-portable in
    the Java∩RE2 dialect; NULL and scheme-less strings pass through
    the same path unharmed (host rules simply don't match). This is
    the canonical-key producer for exact URL dedup — content-level
    near-dup (MinHash etc.) is the complementary stage."""
    u = _c(url)
    nofrag = F.regexp_replace(u, r"#.*$", "")
    base = F.regexp_extract(nofrag, r"^[^?]*", 0)
    query = F.regexp_extract(nofrag, r"^[^?]*\?(.*)$", 1)
    schemehost = F.regexp_extract(
        base, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", 0
    )
    rest = F.substring(base, F.length(schemehost) + 1, F.lit(2 ** 31 - 1))
    # default-port strip is SCHEME-ANCHORED: :80 only under http and
    # :443 only under https — http://host:443/x is a DIFFERENT
    # resource than http://host/x, and the unanchored form over-merged
    # it in crawl dedup (round-8 advice)
    lowered = F.regexp_replace(F.lower(schemehost), r"://www\.", "://")
    host_norm = F.regexp_replace(
        F.regexp_replace(lowered, r"^(http://.*):80$", "$1"),
        r"^(https://.*):443$",
        "$1",
    )
    rest_norm = F.regexp_replace(rest, r"/+$", "")
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(URL_TRACKING_PARAMS_RE),
    )
    q_norm = F.array_join(F.array_sort(params), "&")
    return F.concat(
        host_norm,
        rest_norm,
        F.when(q_norm != "", F.concat(F.lit("?"), q_norm)).otherwise(
            F.lit("")
        ),
    )
