"""Rule tables driving extraction, scoring, and validation.

These are *data* constants whose values reproduce the reference system's
observable semantics (amirtha-1412/knowledge-graph-builder). Each table
cites the reference location it was derived from. They are broadcast to
executors (either as Catalyst literals inside generated `when` chains or
as tiny broadcast dim tables) — never shipped per-row.

Ordering matters in several tables and is load-bearing:

* ``ROLE_INDICATORS`` — dict order decides which role wins when several
  indicators appear in one sentence (reference relationship_logic.py:159,
  plain dict iteration order).
* ``EVENT_PATTERNS`` — dict order decides the event type when several
  trigger families match (reference event_extraction.py:50).
* ``ORG_SUFFIXES`` — applied sequentially; an earlier suffix strips before
  a later one is tested against the shortened string
  (reference nlp_engine.py:38-41).
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Role-based relationship indicators (reference relationship_logic.py:17-28).
# Flattened to an ordered list of (rel_type, indicator) so the generated
# Catalyst `when` chain preserves dict-then-list iteration order exactly.
# ---------------------------------------------------------------------------
ROLE_INDICATORS: list[tuple[str, list[str]]] = [
    ("FOUNDED", ["founded", "co-founded", "founder of", "founded by"]),
    ("CEO_OF", ["ceo of", "chief executive of", "ceo", "chief executive officer", "current ceo"]),
    ("FORMER_CEO_OF", ["former ceo", "ex-ceo", "previously ceo", "was ceo", "former chief executive"]),
    ("CTO_OF", ["cto of", "chief technology officer"]),
    ("CFO_OF", ["cfo of", "chief financial officer"]),
    ("PRESIDENT_OF", ["president of"]),
    ("DIRECTOR_OF", ["director of"]),
    ("EMPLOYED_BY", ["works at", "works for", "employee at", "employed by", "working at"]),
    ("ACQUIRED", ["acquired", "acquired by", "bought", "purchased"]),
    ("HEADQUARTERED_IN", ["headquartered in", "headquarters in", "based in", "headquartered at"]),
]

ROLE_INDICATOR_PAIRS: list[tuple[str, str]] = [
    (rel, ind) for rel, inds in ROLE_INDICATORS for ind in inds
]

# Indicator must sit within this many chars of both entities
# (reference relationship_logic.py:170).
ROLE_INDICATOR_MAX_DISTANCE = 80

# Engineering guard with no reference counterpart: cap each per-sentence
# entity-type bucket before the pair rules. A pathological document with
# no sentence boundaries (one multi-megabyte "sentence") otherwise turns
# the sentence-scoped cross products quadratic — tens of thousands of
# mentions per bucket -> billions of pairs in ONE task. The reference
# would hang identically; at 10^12-turn scale such documents are a
# certainty, so the fan-out must be bounded by construction (same
# philosophy as the dedup/canonicalization block caps). 50 x 50 pairs per
# sentence is far above any real sentence's entity count.
MAX_BUCKET_PER_SENTENCE = 50

# ---------------------------------------------------------------------------
# Verb-lemma -> relationship map for SVO extraction
# (reference relationship_logic.py:31-101). Lookup key is the verb LEMMA,
# so inflected keys in the reference table are unreachable there; we keep
# the full table for parity and feed it lemmas.
# ---------------------------------------------------------------------------
VERB_TO_RELATIONSHIP: dict[str, str] = {
    "own": "OWNS", "owns": "OWNS", "possess": "OWNS",
    "control": "CONTROLS", "controls": "CONTROLS",
    "found": "FOUNDED", "founded": "FOUNDED", "co-found": "FOUNDED",
    "employ": "EMPLOYS", "employs": "EMPLOYS", "hire": "EMPLOYS", "hired": "EMPLOYS",
    "work": "EMPLOYED_BY", "works": "EMPLOYED_BY",
    "locate": "LOCATED_IN", "located": "LOCATED_IN",
    "base": "HEADQUARTERED_IN", "based": "HEADQUARTERED_IN",
    "headquarter": "HEADQUARTERED_IN", "headquartered": "HEADQUARTERED_IN",
    "acquire": "ACQUIRED", "acquired": "ACQUIRED",
    "buy": "ACQUIRED", "bought": "ACQUIRED",
    "purchase": "ACQUIRED", "purchased": "ACQUIRED",
    "produce": "PRODUCES", "produces": "PRODUCES",
    "manufacture": "PRODUCES", "manufactures": "PRODUCES",
    "make": "PRODUCES", "makes": "PRODUCES",
    "create": "CREATES", "creates": "CREATES",
    "develop": "DEVELOPS", "develops": "DEVELOPS",
    "build": "BUILDS", "builds": "BUILDS",
    "release": "RELEASED", "released": "RELEASED",
    "launch": "LAUNCHED", "launched": "LAUNCHED",
    "establish": "ESTABLISHED", "established": "ESTABLISHED",
    "occur": "OCCURRED", "occurred": "OCCURRED",
    "happen": "OCCURRED", "happened": "OCCURRED",
    "collaborate": "COLLABORATES_WITH", "collaborates": "COLLABORATES_WITH",
    "partner": "PARTNERS_WITH", "partners": "PARTNERS_WITH",
    "compete": "COMPETES_WITH", "competes": "COMPETES_WITH",
    "rival": "COMPETES_WITH", "rivals": "COMPETES_WITH",
}

# Confidence model (reference relationship_logic.py:106-147).
MIN_CONFIDENCE_THRESHOLD = 0.6
HIGH_CONFIDENCE_VERBS = ["acquired", "founded", "owns", "produces", "headquartered"]
STRONG_INDICATORS = [
    "CEO of", "founder of", "president of", "director of", "CTO of", "CFO of",
    "acquired by", "owned by", "produced by", "developed by",
    "part of", "subsidiary of", "division of", "headquartered in",
    "co-founded", "chief executive",
]

# ---------------------------------------------------------------------------
# Entity whitelists and the normalized type layer
# (reference extraction_rules.py:15-37, 85-90).
# ---------------------------------------------------------------------------
STRUCTURAL_TYPES = ["PERSON", "ORG", "GPE", "PRODUCT", "EVENT", "FAC", "WORK_OF_ART"]
METADATA_LABELS = ["DATE", "MONEY", "PERCENT", "CARDINAL", "ORDINAL"]

ALLOWED_RELATIONSHIP_TYPES = [
    "FOUNDED", "CEO_OF", "FORMER_CEO_OF", "EMPLOYED_BY", "PRODUCES", "RELEASED",
    "DEVELOPS", "OPERATES", "LOCATED_IN", "HEADQUARTERED_IN", "COLLABORATES_WITH",
    "COMPETES_WITH", "ACQUIRED",
]

# spaCy-layer -> normalized-layer. No producer exists for ORGANIZATION and
# EVENT/FAC/WORK_OF_ART have no entry — both facts are load-bearing
# (reference extraction_rules.py:85-90; SURVEY.md §1.2).
SPACY_TO_NORMALIZED = {
    "PERSON": "PERSON",
    "ORG": "COMPANY",
    "GPE": "LOCATION",
    "PRODUCT": "PRODUCT",
}

# (rel_type, source_norm_type, target_norm_type) whitelist
# (reference extraction_rules.py:40-82). 15 pairs over 13 types.
SEMANTIC_RULES: list[tuple[str, str, str]] = [
    ("FOUNDED", "PERSON", "COMPANY"),
    ("CEO_OF", "PERSON", "COMPANY"),
    ("FORMER_CEO_OF", "PERSON", "COMPANY"),
    ("EMPLOYED_BY", "PERSON", "COMPANY"),
    ("EMPLOYED_BY", "PERSON", "ORGANIZATION"),
    ("PRODUCES", "COMPANY", "PRODUCT"),
    ("RELEASED", "COMPANY", "PRODUCT"),
    ("DEVELOPS", "COMPANY", "PRODUCT"),
    ("OPERATES", "COMPANY", "ORGANIZATION"),
    ("LOCATED_IN", "COMPANY", "LOCATION"),
    ("LOCATED_IN", "ORGANIZATION", "LOCATION"),
    ("HEADQUARTERED_IN", "COMPANY", "LOCATION"),
    ("COMPETES_WITH", "COMPANY", "COMPANY"),
    ("COLLABORATES_WITH", "COMPANY", "COMPANY"),
    ("ACQUIRED", "COMPANY", "COMPANY"),
]

# ---------------------------------------------------------------------------
# Type-correction lexicons (reference nlp_engine.py:70-89). Matching is on
# lower().strip(); the product lexicon wins over the company lexicon
# (reference nlp_engine.py:94-99).
# ---------------------------------------------------------------------------
KNOWN_COMPANIES = [
    "alibaba", "amazon", "google", "microsoft", "apple", "facebook", "meta",
    "tesla", "spacex", "twitter", "x", "netflix", "uber", "airbnb",
    "samsung", "sony", "intel", "amd", "nvidia", "oracle", "ibm",
    "tencent", "baidu", "salesforce", "cisco", "huawei", "xiaomi",
]

KNOWN_PRODUCTS = [
    "kindle", "echo", "fire tv", "fire stick", "alexa", "prime",
    "iphone", "ipad", "macbook", "airpods", "apple watch", "imac", "mac",
    "windows", "xbox", "surface", "office", "azure",
    "android", "chrome", "gmail", "google maps", "pixel",
    "playstation", "ps5", "nintendo switch", "tesla model s", "tesla model 3",
]

# Force-detected products (reference nlp_engine.py:198): substring match on
# the lowered document; added as a PRODUCT entity (capitalize()d) when no
# case-insensitive name match already exists.
FORCE_DETECT_PRODUCTS = ["echo", "alexa", "siri", "cortana"]

# ---------------------------------------------------------------------------
# Name normalization (reference nlp_engine.py:29-53). The suffix list is
# applied as a sequential loop (each suffix tested against the result of
# prior strips), only for ORG/GPE. Abbreviation expansion only for GPE.
# ---------------------------------------------------------------------------
ORG_SUFFIXES = [" Inc.", " Inc", " LLC", " Corp.", " Corporation", " Ltd.", " Limited", " Co."]
GPE_ABBREVIATIONS = {"U.S.": "United States", "U.K.": "United Kingdom", "U.S.A.": "United States"}

MAX_TEXT_LENGTH = 2_000_000  # reference nlp_engine.py:20

# ---------------------------------------------------------------------------
# Event patterns (reference event_extraction.py:12-38). Ordered: the first
# family containing a matching trigger wins; within a family the first
# matching trigger (list order) decides the confidence.
# Confidence = min(0.9, 0.6 + n_words(trigger) * 0.1)
# (reference event_extraction.py:54).
# ---------------------------------------------------------------------------
EVENT_PATTERNS: list[tuple[str, dict]] = [
    ("Acquisition", {
        "triggers": ["acquired", "bought", "purchased", "acquisition of", "acquires", "buying"],
        "required_entities": ["ORG"],
    }),
    ("ProductLaunch", {
        "triggers": ["launched", "released", "introduced", "unveiled", "announced"],
        "required_entities": ["PRODUCT", "ORG"],
    }),
    ("LeadershipChange", {
        "triggers": ["appointed", "named", "became ceo", "stepped down", "resigned", "hired as"],
        "required_entities": ["PERSON", "ORG"],
    }),
    ("Conference", {
        "triggers": ["conference", "summit", "keynote", "presentation at", "speaking at"],
        "required_entities": ["EVENT"],
    }),
    ("FundingRound", {
        "triggers": ["raised", "funding round", "investment", "series a", "series b", "venture capital"],
        "required_entities": ["ORG"],
    }),
]

EVENT_PARTICIPANT_TYPES = ["PERSON", "ORG", "PRODUCT", "EVENT"]  # event_extraction.py:123
EVENT_MIN_CONFIDENCE = 0.5  # OTHER (0.3) is always skipped, event_extraction.py:109


def event_trigger_confidence(trigger: str) -> float:
    """min(0.9, 0.6 + word_count * 0.1) — reference event_extraction.py:54."""
    return min(0.9, 0.6 + len(trigger.split()) * 0.1)
