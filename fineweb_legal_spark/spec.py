"""Single source of truth for every rule constant, lexicon, and pattern.

Both the single-node pandas oracle (``fineweb_legal_spark.oracle``) and the
Spark engine (``fineweb_legal_spark.pipeline``) consume THIS module, so the
two sides cannot drift (SURVEY.md §7.3 hard-part 1).

Reference analogs (for parity auditing, see /root/reference):
- bounded-prefix evaluation windows  -> scripts/stream_filter_stage1.py:140-142
- ordered cheap-first predicate chain -> scripts/stream_filter_stage1.py:190-224
- keyword/boilerplate lexicon style   -> scripts/stream_filter_stage1.py:48-115
- dedup normalization (strip+lower)   -> src/fineweb_legal/storage.py:33-36

The transcript rule-set itself is new (per north_rule): FineWeb/Gopher-style
per-turn heuristics + language-ID + perplexity + PII/profanity scrub.
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# Stage order. ``reject_reason`` is the FIRST failing stage in this order.
# Cheap native-expression heuristics run first (whole-stage codegen), model
# stages (pandas UDF) only on heuristic survivors, dedup last.
# Mirrors the reference's "fastest rejections first" ordering
# (stream_filter_stage1.py:190-199) re-derived for the transcript rules.
# ---------------------------------------------------------------------------
STAGES = (
    "length",
    "conv_stats",
    "word_stats",
    "stopword_ratio",
    "repetition",
    "symbol_ratio",
    "lang",
    "perplexity",
    "duplicate",
)

# --- length rule (reference analog F1: stream_filter_stage1.py:203-206) ----
MIN_TURN_CHARS = 25
MAX_TURN_CHARS = 20_000

# --- conversation-level rule (two-phase salted aggregation path, P16) ------
# mean words/turn over ALL turns of the conversation (null text counts as 0).
MIN_CONV_MEAN_WORDS = 8.0

# --- word-stats rule (Gopher-style) -----------------------------------------
MIN_TURN_WORDS = 5
MAX_TURN_WORDS = 5_000
MIN_MEAN_WORD_LEN = 2.0
MAX_MEAN_WORD_LEN = 12.0

# --- stop-word rule ---------------------------------------------------------
# Applies only when word_count >= STOPWORD_MIN_WORDS (short turns exempt).
STOPWORDS = frozenset(
    "the a an and or of to in is it that for on with as at this be are was "
    "i you he she we they not have has had do does did will would can".split()
)
STOPWORD_MIN_WORDS = 10
MIN_STOPWORD_RATIO = 0.02

# --- repetition rule (Gopher duplicate-line / distinct-word fractions) ------
REPETITION_MIN_LINES = 5
MAX_DUP_LINE_FRACTION = 0.30
REPETITION_MIN_WORDS = 30
MIN_DISTINCT_WORD_RATIO = 0.30

# --- symbol-to-char rule -----------------------------------------------------
# Explicit ASCII symbol set (unicode-safe: accented/CJK text is NOT symbolic).
SYMBOL_CHARS = "#{}[]<>|\\^~`$%@*=_+/"
MAX_SYMBOL_RATIO = 0.10
# identical char-class, Python-re and Java-regex dialects
SYMBOL_CLASS_RE = r"[#{}\[\]<>|\\^~`$%@*=+_/]"

# --- language-ID stage (fastText-lid analog; hashed char-trigram model) -----
LANGID_LANGS = ("en", "es", "fr", "de", "it")
LANGID_KEEP_LANG = "en"
LANGID_PREFIX_CHARS = 1_000  # bounded-prefix evaluation (P2 analog)
LANGID_HASH_BITS = 16  # 65,536-slot hashed trigram table

# --- perplexity stage (KenLM-style char-trigram LM) --------------------------
PPL_PREFIX_CHARS = 2_000
# Calibrated against the embedded corpus: in-domain English prose scores
# ~6k-12k, German ~20k-34k, word salad ~22k+, gibberish ~58k.
PPL_MAX = 15_000.0  # keep iff char-trigram perplexity <= PPL_MAX
PPL_BUCKET_WIDTH = 500.0
PPL_BUCKET_MAX = 127  # histogram buckets 0..127, clamped

# --- scrubber (Python `re` ONLY — runs inside the pandas UDF and the oracle,
#     never as JVM regexp_replace, so both sides share one regex engine) -----
EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)*\.[A-Za-z]{2,}")
# SSN: 123-45-6789 and bare 9-digit runs; guards reject digit-adjacent
# contexts (version strings like 1.2.123-45-6789, ISBNs, longer digit runs)
# while still matching at sentence punctuation ("... 123-45-6789.").
_NUM_GUARD_L = r"(?<!\d)(?<!\d\.)(?<!\d-)"
_NUM_GUARD_R = r"(?!\d)(?!\.\d)(?!-\d)"
SSN_RE = re.compile(_NUM_GUARD_L + r"\d{3}-\d{2}-\d{4}" + _NUM_GUARD_R)
SSN9_RE = re.compile(_NUM_GUARD_L + r"\d{9}" + _NUM_GUARD_R)
# US phone formats: (123) 456-7890 | 123-456-7890 | 123.456.7890 | +1 555 123 4567
PHONE_RE = re.compile(
    _NUM_GUARD_L
    + r"(?:\+?1[-. ])?(?:\(\d{3}\)[-. ]?|\d{3}[-. ])\d{3}[-. ]\d{4}"
    + _NUM_GUARD_R
)
EMAIL_TOKEN = "[EMAIL]"
SSN_TOKEN = "[SSN]"
PHONE_TOKEN = "[PHONE]"
PROFANITY_TOKEN = "[CENSORED]"
PROFANITY_LEXICON = (
    "damn", "dammit", "hell", "crap", "bastard", "idiot", "moron",
    "stupid", "jerk", "dumbass", "screwed", "sucks",
)
PROFANITY_RE = re.compile(
    r"\b(?:" + "|".join(PROFANITY_LEXICON) + r")\b", re.IGNORECASE
)

# --- dedup (reference analog J1/U3: storage.py:33-36, consolidate:66-81) ----
# key = md5(normalized text); normalized = strip + lower (Python semantics,
# computed inside the pandas UDF so Spark and oracle agree byte-for-byte).
# "first" winner = min (conv_id, turn_idx)  [SURVEY.md §7.3 hard-part 3].

# --- lineage / commit protocol ----------------------------------------------
# partition bucket = pmod(xxhash64(conv_id), LINEAGE_BUCKETS), computed in
# lineage.bucket_of. xxhash64 is Spark-specific: bucket membership is only
# reproducible inside Spark, which is fine because both the writer and the
# resume reader are Spark jobs (nothing outside Spark ever recomputes it).
LINEAGE_BUCKETS = 16

# ===========================================================================
# Reference stage-1 web-document filter (exact parity suite, SURVEY §2.2).
# These constants reproduce the semantics of scripts/stream_filter_stage1.py
# for the auxiliary `webdocs` (id, text, url) table — independently derived
# expressions, not copied code.
# ===========================================================================
WEB_MIN_CHARS = 500  # stream_filter_stage1.py:515-524 defaults
WEB_MAX_CHARS = 50_000
WEB_BOILER_WINDOW = 1_000  # :140
WEB_KEYWORD_WINDOW = 5_000  # :141
WEB_CITATION_WINDOW = 8_000  # :142
WEB_MIN_KEYWORDS = 2  # :139

# 21 news-URL reject substrings (style of :109-115; our own list)
NEWS_URL_PATTERNS = (
    "nytimes.com", "cnn.com", "foxnews.com", "washingtonpost.com",
    "theguardian.com", "bbc.com", "reuters.com", "apnews.com",
    "bloomberg.com", "huffpost.com", "nbcnews.com", "abcnews.go.com",
    "usatoday.com", "latimes.com", "npr.org",
    "/news/", "/article/", "/story/", "/blog/", "/press-release/", "/opinion/",
)

# 37-phrase boilerplate lexicon (style of :48-71; our own list)
BOILERPLATE_PHRASES = (
    "privacy policy", "terms of service", "terms and conditions",
    "we use cookies", "cookie policy", "cookie settings",
    "subscribe to our newsletter", "sign up for our newsletter",
    "all rights reserved", "copyright ©", "follow us on",
    "share this article", "leave a comment", "related posts",
    "click here to", "read more at", "advertisement",
    "sponsored content", "affiliate links", "contact us at",
    "unsubscribe", "manage your preferences", "log in to your account",
    "create an account", "free trial", "limited time offer",
    "breaking news alert", "trending now", "most popular",
    "recommended for you", "back to top", "skip to content",
    "enable javascript", "your browser is not supported",
    "add to cart", "buy now", "shipping information",
)

# 47 quality keywords (style of :76-104; our own legal-domain list)
QUALITY_KEYWORDS = (
    "plaintiff", "defendant", "appellant", "appellee", "petitioner",
    "respondent", "jurisdiction", "statute", "statutory", "pursuant",
    "herein", "hereby", "thereof", "whereas", "tort", "negligence",
    "liability", "damages", "injunction", "remand", "affirmed",
    "reversed", "vacated", "certiorari", "precedent", "holding",
    "dicta", "motion to dismiss", "summary judgment", "due process",
    "equal protection", "habeas corpus", "subpoena", "deposition",
    "testimony", "evidence code", "burden of proof", "reasonable doubt",
    "contractual", "indemnify", "covenant", "easement", "fiduciary",
    "arbitration", "appellate court", "district court", "supreme court",
)

# 14 citation regexes (style of :121-136; our own patterns).
# Stored as (pattern, case_sensitive) so both engines fold them identically.
CITATION_PATTERNS = (
    (r"v\.\s+[A-Z][a-z]+", True),            # Case v. Name
    (r"\d+\s+U\.S\.C\.\s*§*\s*\d+", True),   # 42 U.S.C. § 1983
    (r"§+\s*\d+", True),                      # § 230
    (r"\d+\s+F\.\s*(?:2d|3d|4th)\s+\d+", True),  # 123 F.3d 456
    (r"\d+\s+U\.S\.\s+\d+", True),            # 410 U.S. 113
    (r"\d+\s+S\.\s*Ct\.\s+\d+", True),        # 135 S. Ct. 2584
    (r"No\.\s+\d{2}-\d+", True),              # docket No. 20-1234
    (r"\bId\.\s+at\s+\d+", True),             # Id. at 17
    (r"\bsupra\s+note\s+\d+", False),         # supra note 12
    (r"\binfra\s+part\s+[IVX]+", False),      # infra Part III
    (r"\bcert\.\s+denied\b", False),          # cert. denied
    (r"\ben\s+banc\b", False),                # en banc
    (r"\bamicus\s+curiae\b", False),          # amicus curiae
    (r"\bres\s+judicata\b", False),           # res judicata
)

# score thresholds (reference F7/F8: model_inference_stage2.py:57,269;
# create_dataset_splits.py:26-30)
SCORE_KEEP_THRESHOLD = 3.0
SCORE_TIERS = {"default": 3.0, "high_quality": 4.0, "supreme": 4.8}
