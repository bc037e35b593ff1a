"""Content-domain classification (DomainType producer).

The reference threads a ``DomainType`` through extraction, quality and
dedup (`/root/reference/src/quarrycore/protocols.py:68-78`): per-domain
MinHash thresholds (`deduplicator/deduplicator.py:84-91` ->
``config.DedupConfig.domain_minhash_thresholds``), domain extractors and
metadata enrichment. Round-2 consumed a ``domain`` column but nothing
produced one; this stage closes that gap.

Two layers, mirroring the reference:

1. URL layer — substring indicators on the host, checked in the
   reference's order (academic, news, technical, legal, medical;
   `extractor/cascade_extractor.py:636-661`). First hit wins.
2. Content-keyword layer — per-domain keyword sets verbatim from
   `extractor/domain_extractors.py:71,252,478,773` scored with the
   reference confidence formula (`domain_extractors.py:40-52`):
   ``(matches / n_keywords) * min(1, n_words / 1000)`` using substring
   containment on lowercased text. The best-scoring domain wins (fixed
   order medical > legal > ecommerce > technical breaks ties, matching
   the factory registration order at `domain_extractors.py:1105-1112`);
   score 0 falls back to "general".

Everything is vectorized: one ``pyarrow.compute.match_substring`` kernel
per indicator/keyword, integer adds for the counts — no per-row Python.
The classification is deterministic and uses only integer counts and
exact float arithmetic mirrored by the DuckDB oracle
(`__ray_entry__.oracle_sql()["domain_classify_docs"]`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# (domain, host substrings) in the reference's check order
# (cascade_extractor.py:640-660); first match wins.
URL_INDICATORS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("academic", (".edu", "arxiv", "scholar", "pubmed")),
    ("news", ("news", "times", "post", "guardian", "reuters")),
    ("technical", ("github", "stackoverflow", "docs", "api")),
    ("legal", ("law", "legal", "court", "gov")),
    ("medical", ("health", "medical", "nih", "who")),
)

# keyword sets verbatim from the reference domain extractors
# (domain_extractors.py: MedicalExtractor:71, LegalExtractor:252,
# EcommerceExtractor:478, TechnicalExtractor:773)
DOMAIN_KEYWORDS: dict[str, tuple[str, ...]] = {
    "medical": (
        "patient", "diagnosis", "treatment", "therapy", "clinical",
        "medical", "disease", "syndrome", "disorder", "symptom",
        "procedure", "surgery", "medication", "drug", "dosage",
        "prescription", "pharmaceutical", "hospital", "clinic", "doctor",
        "physician", "nurse", "healthcare", "anatomy", "physiology",
        "pathology", "radiology", "oncology", "cardiology", "neurology",
        "pediatrics", "geriatrics", "psychiatry",
    ),
    "legal": (
        "court", "judge", "jury", "trial", "case", "lawsuit",
        "litigation", "plaintiff", "defendant", "attorney", "lawyer",
        "counsel", "barrister", "statute", "regulation", "law", "legal",
        "judicial", "jurisdiction", "appeal", "motion", "brief",
        "ruling", "verdict", "judgment", "sentence", "contract",
        "agreement", "liability", "damages", "injunction", "precedent",
        "constitutional", "federal", "state", "municipal", "civil",
        "criminal",
    ),
    "ecommerce": (
        "product", "price", "buy", "purchase", "order", "cart",
        "checkout", "shipping", "delivery", "return", "warranty",
        "guarantee", "review", "rating", "star", "customer", "seller",
        "brand", "model", "size", "color", "style", "material", "weight",
        "dimension", "specification", "inventory", "stock", "available",
        "sale", "discount", "offer",
    ),
    "technical": (
        "code", "function", "class", "method", "variable", "parameter",
        "api", "endpoint", "request", "response", "json", "xml", "http",
        "library", "framework", "dependency", "package", "module",
        "import", "version", "release", "update", "patch", "build",
        "deploy", "test", "performance", "benchmark", "optimization",
        "scalability", "latency", "documentation", "tutorial", "example",
        "guide", "reference", "manual",
    ),
}

#: tie-break preference (reference factory registration order,
#: domain_extractors.py:1105-1112)
KEYWORD_DOMAINS: tuple[str, ...] = ("medical", "legal", "ecommerce", "technical")


def _match_counts(lower_texts: pa.Array, keywords) -> np.ndarray:
    """#keywords contained in each text — one kernel per keyword."""
    n = len(lower_texts)
    counts = np.zeros(n, dtype=np.int64)
    for kw in keywords:
        hit = pc.match_substring(lower_texts, kw)
        counts += np.asarray(
            pc.fill_null(pc.cast(hit, pa.int64()), 0), dtype=np.int64
        )
    return counts


def _count_scale(texts: pa.Array) -> tuple[dict[str, np.ndarray], np.ndarray]:
    """(per-domain keyword-match counts, length scale) for a batch —
    the two inputs of the reference confidence formula
    (domain_extractors.py:40-52; n_words via single-space split of the
    whitespace-normalized text, matching the SQL oracle)."""
    lower = pc.utf8_lower(texts)
    n_words = np.asarray(
        pc.cast(
            pc.list_value_length(
                pc.split_pattern(
                    pc.replace_substring_regex(pc.utf8_trim_whitespace(texts), r"\s+", " "),
                    " ",
                )
            ),
            pa.int64(),
        ),
        dtype=np.float64,
    )
    scale = np.minimum(1.0, n_words / 1000.0)
    counts = {d: _match_counts(lower, kws) for d, kws in DOMAIN_KEYWORDS.items()}
    return counts, scale


def keyword_confidences(texts: pa.Array) -> dict[str, np.ndarray]:
    """Per-domain reference confidence scores for a batch of texts:
    (matches / n_keywords) * min(1, n_words / 1000)."""
    counts, scale = _count_scale(texts)
    return {
        d: (counts[d] / float(len(DOMAIN_KEYWORDS[d]))) * scale
        for d in DOMAIN_KEYWORDS
    }


def classify_domains(
    texts: pa.Array, urls: pa.Array | None = None
) -> tuple[pa.Array, pa.Array]:
    """(domain, n_matched_keywords) arrays for a batch.

    URL indicators take precedence when a `urls` column is given;
    otherwise (and for non-matching hosts) the keyword layer decides.
    """
    n = len(texts)
    match_counts, scale = _count_scale(texts)
    conf = {
        d: (match_counts[d] / float(len(DOMAIN_KEYWORDS[d]))) * scale
        for d in DOMAIN_KEYWORDS
    }
    best = np.full(n, "general", dtype=object)
    best_conf = np.zeros(n, dtype=np.float64)
    matched = np.zeros(n, dtype=np.int64)
    # fixed preference order: strictly-greater replaces, so earlier
    # domains win ties (reference factory order)
    for d in KEYWORD_DOMAINS:
        take = conf[d] > best_conf
        best[take] = d
        best_conf[take] = conf[d][take]
        matched[take] = match_counts[d][take]
    zero = best_conf <= 0.0
    best[zero] = "general"
    matched[zero] = 0

    if urls is not None:
        hosts = pc.utf8_lower(pc.fill_null(urls, ""))
        assigned = np.zeros(n, dtype=bool)
        for d, indicators in URL_INDICATORS:
            hit = np.zeros(n, dtype=bool)
            for ind in indicators:
                hit |= np.asarray(
                    pc.fill_null(pc.match_substring(hosts, ind), False),
                    dtype=bool,
                )
            hit &= ~assigned
            best[hit] = d
            assigned |= hit

    return (
        pa.array(best.tolist(), pa.string()),
        pa.array(matched, pa.int64()),
    )


class DomainClassifyStage:
    """map_batches stage: adds a `domain` column (and
    `domain_keyword_matches`) from `text` and an optional `url` column —
    the producer for config.DedupConfig.domain_minhash_thresholds
    consumers (stages/verify.PairVerifier via pipelines/dedup._add_thr).
    """

    def __init__(self, text_col: str = "text", url_col: str | None = None,
                 with_matches: bool = False):
        self.text_col = text_col
        self.url_col = url_col
        self.with_matches = with_matches

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch[self.url_col] if self.url_col in (batch.column_names) else None
        domain, matches = classify_domains(
            pc.cast(batch[self.text_col], pa.string()), urls
        )
        out = batch.append_column("domain", domain)
        if self.with_matches:
            out = out.append_column("domain_keyword_matches", matches)
        return out
