"""Deterministic synthetic web-page / knowledge-base fixture generator.

The reference ships no test suite (SURVEY.md §5); correctness here is
established against driver-style synthetic tables (FIXTURES.md).  This
module generates, with a fixed seed and **no wall-clock**, the four
tables the engine consumes / is graded on:

* ``pages``            (url, warc_ts, html, text, lang)  — input-hint shape
* ``kb_entities``      (page_title, qid, type, label, aliases, proba,
                        longitude, latitude, dateofbirth, inception,
                        context_tokens)
* ``mentions_gt``      (url, mention_id, surface, type, sent_no, tok_start,
                        tok_end, qid)
* ``mention_pairs_gt`` (url_a, mention_id_a, url_b, mention_id_b,
                        same_entity, block_key)

Design notes (FIXTURES.md §2): deliberate *ambiguity families* share an
identical surface across different QIDs so blocking alone cannot decide —
the pairwise scorer must use per-entity context vocabulary; one *hot*
entity appears in a large fraction of pages (skew / salting test).
``html`` wraps the sentences with noise (title, script, comments,
entities) and ``text`` is produced by the versioned
:func:`sbb_ned_ray.functions.extract.extract_text`, making the per-url
byte-identical invariant testable end-to-end.
"""

from __future__ import annotations

import hashlib
import html as _html
import json
import os
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from sbb_ned_ray.functions.extract import EXTRACTOR_VERSION, extract_text
from sbb_ned_ray.functions.normalization import normalized_surface_key

FIXTURE_VERSION = "8"

# --- deterministic vocabularies -------------------------------------------

_FIRST = ["Anna", "Karl", "Marie", "Otto", "Paula", "Hans", "Clara", "Emil",
          "Greta", "Ludwig", "Ida", "Franz", "Elsa", "Georg", "Berta", "Kurt"]
_LAST = ["Hilton", "Müller", "Schmidt", "Weber", "Wagner", "Becker", "Hoffmann",
         "Koch", "Richter", "Klein", "Wolf", "Neumann", "Braun", "Krüger",
         "Vogel", "Berger"]
_LOC_STEM = ["Paris", "Berlin", "Hamburg", "Lindau", "Bremen", "Fulda",
             "Gotha", "Jena", "Kassel", "Mainz", "Trier", "Worms", "Speyer",
             "Aachen", "Erfurt", "Weimar"]
_ORG_STEM = ["Bank", "Verlag", "Werke", "Institut", "Union", "Verein",
             "Akademie", "Theater", "Museum", "Brauerei"]
_ORG_PRE = ["Nord", "Süd", "Hansa", "Stern", "Adler", "Krone", "Linde",
            "Eichen", "Rhein", "Elbe"]

# filler words for sentences (common pool, shared by all entities)
_FILLER = ("der die das und in von mit auf für als auch bei nach aus einem "
           "einer wurde wird war sind the of and in to was is for with at "
           "from city year große kleine alte neue heute gestern").split()

# context vocabulary pool — entities draw disjoint slices from this
_CTX_POOL = [f"ctx{chr(97 + i % 26)}{i:04d}" for i in range(20000)]


@dataclass(frozen=True)
class FixtureSpec:
    n_pages: int = 200
    n_entities: int = 120
    n_gt_pairs: int = 400
    seed: int = 42
    ambiguity_fraction: float = 0.25   # entities living in shared-surface families
    hot_page_fraction: float = 0.15    # pages that mention the hot entity
    sentences_per_page: tuple[int, int] = (2, 5)
    n_files: int = 4                   # parquet files for pages (→ Ray blocks)
    # page_seed != 0 re-seeds the PAGE stream only: two specs differing
    # only in page_seed/n_pages share an IDENTICAL KB (entities are
    # drawn from `seed` before any page) — disjoint train/eval corpora
    # over one knowledge base, the cross-encoder trainer's split
    page_seed: int = 0

    def fingerprint(self) -> str:
        payload = json.dumps(asdict(self), sort_keys=True) + \
            f"|v{FIXTURE_VERSION}|x{EXTRACTOR_VERSION}"
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


def _build_entities(spec: FixtureSpec, rng: np.random.Generator):
    """Returns list of dict rows for kb_entities."""
    ents = []
    n = spec.n_entities
    n_ambig = int(n * spec.ambiguity_fraction)
    # ambiguity families of size 2-3 sharing one label
    fam_sizes = []
    left = n_ambig
    while left > 1:
        s = int(rng.integers(2, 4))
        s = min(s, left)
        fam_sizes.append(s)
        left -= s

    qid_counter = 1000
    ent_idx = 0
    used_titles: set[str] = set()

    def make_label(etype: str, k: int) -> str:
        if etype == "PER":
            return f"{_FIRST[k % len(_FIRST)]} {_LAST[(k * 7 + k // len(_FIRST)) % len(_LAST)]}"
        if etype == "LOC":
            stem = _LOC_STEM[k % len(_LOC_STEM)]
            suffix = k // len(_LOC_STEM)
            return stem if suffix == 0 else f"{stem}hausen{suffix}"
        pre = _ORG_PRE[k % len(_ORG_PRE)]
        stem = _ORG_STEM[(k * 3) % len(_ORG_STEM)]
        return f"{pre}-{stem} {k // len(_ORG_PRE) + 1}"

    types = ["PER", "LOC", "ORG"]

    def add_entity(label: str, etype: str, family_id: int | None):
        nonlocal qid_counter, ent_idx
        qid = f"Q{qid_counter}"
        qid_counter += 1
        ctx_lo = ent_idx * 12
        context = _CTX_POOL[ctx_lo: ctx_lo + 12]
        title = label.replace(" ", "_")
        # page_title is a UNIQUE key (as in Wikipedia): family members and
        # accidental label collisions get a qid-disambiguated title
        if family_id is not None or title in used_titles:
            title = f"{title}_({qid})"
        used_titles.add(title)
        aliases = _make_aliases(label)
        ents.append({
            "page_title": title,
            "qid": qid,
            "type": etype,
            "label": label,
            "aliases": aliases,
            "proba": 0.0,  # filled after Zipf
            "longitude": float(rng.uniform(-10, 30)) if etype != "PER" else None,
            "latitude": float(rng.uniform(35, 60)) if etype != "PER" else None,
            "dateofbirth": (np.datetime64("1800-01-01")
                            + np.timedelta64(int(rng.integers(0, 60000)), "D")
                            ).astype("datetime64[us]") if etype == "PER" else None,
            "inception": (np.datetime64("1700-01-01")
                          + np.timedelta64(int(rng.integers(0, 100000)), "D")
                          ).astype("datetime64[us]") if etype == "ORG" else None,
            "context_tokens": context,
            "family_id": family_id if family_id is not None else -1,
        })
        ent_idx += 1

    # ambiguity families first: same label, mixed types, distinct qids/contexts
    fam_id = 0
    for size in fam_sizes:
        etype0 = types[fam_id % 3]
        label = make_label(etype0, 900 + fam_id)
        for j in range(size):
            add_entity(label, types[(fam_id + j) % 3], fam_id)
        fam_id += 1

    k = 0
    while ent_idx < n:
        etype = types[k % 3]
        label = make_label(etype, k)
        # avoid accidental collision with family labels
        if any(e["label"] == label for e in ents[: fam_id * 3]):
            k += 1
            continue
        add_entity(label, etype, None)
        k += 1

    # Zipf popularity prior (reference `proba`, index.py:73)
    ranks = np.arange(1, len(ents) + 1, dtype=np.float64)
    zipf = 1.0 / ranks
    zipf /= zipf.sum()
    order = rng.permutation(len(ents))
    for i, e in enumerate(ents):
        e["proba"] = float(zipf[order[i]])
    # entity 0 is the designated hot entity → give it the max proba
    hot = int(np.argmax([e["proba"] for e in ents]))
    ents[0], ents[hot] = ents[hot], ents[0]
    return ents


def _make_aliases(label: str) -> list[str]:
    """label + deterministic variants (FIXTURES.md §2 — replaces redirects)."""
    aliases = [label]
    low = label.lower()
    if low != label:
        aliases.append(low)
    if " " in label:
        aliases.append(label.replace(" ", "-"))
        parts = label.split(" ")
        if len(parts) == 2 and len(parts[0]) > 1:
            aliases.append(f"{parts[0][0]}. {parts[1]}")   # abbreviation
    if len(label) > 6 and " " not in label:
        # OCR line-break hyphenation variant: "Lin ¬ dau".  The standalone
        # ``¬`` token is what the reference's dehypener joins across
        # (embeddings/base.py:24-46): the mark strips to an empty part,
        # which triggers concatenation of the neighbouring fragments.
        cut = len(label) // 2
        aliases.append(label[:cut] + " ¬ " + label[cut:])
    return aliases


def _build_redirects(ents) -> pa.Table:
    """Redirects table (rd_from_title → rd_title, underscored — the
    reference's SQLite redirects db, webapp/app.py:120-129): one
    redirect-ONLY alternative name per entity.  The source forms never
    appear in page text or aliases, so the flagship over fixtures with
    or without this file is IDENTICAL — the redirect path is exercised
    by its own tests and by the parse_ner input mode."""
    srcs = [f"Altname_{i:05d}" for i in range(len(ents))]
    dsts = [e["page_title"] for e in ents]
    return pa.table({"rd_from_title": pa.array(srcs, pa.string()),
                     "rd_title": pa.array(dsts, pa.string())})


def _page_sentences(spec, rng, ents, page_no):
    """Build one page: list of (tokens, mentions) with
    mentions = list of (tok_start, tok_end, surface, etype, qid)."""
    n_sent = int(rng.integers(spec.sentences_per_page[0],
                              spec.sentences_per_page[1] + 1))
    sentences = []
    hot_page = rng.random() < spec.hot_page_fraction
    for s in range(n_sent):
        toks: list[str] = []
        mentions = []
        n_mentions = int(rng.integers(0, 3))
        if hot_page and s == 0:
            n_mentions = max(1, n_mentions)
        for m in range(n_mentions):
            # filler prefix
            for _ in range(int(rng.integers(2, 6))):
                toks.append(_FILLER[int(rng.integers(0, len(_FILLER)))])
            if hot_page and s == 0 and m == 0:
                ent = ents[0]
            else:
                ent = ents[int(rng.integers(0, len(ents)))]
            alias = ent["aliases"][int(rng.integers(0, len(ent["aliases"])))]
            surf_toks = alias.split(" ")
            start = len(toks)
            toks.extend(surf_toks)
            mentions.append((start, len(toks), alias, ent["type"], ent["qid"]))
            # entity context evidence: 3-5 tokens from its context vocab
            n_ctx = int(rng.integers(3, 6))
            idx = rng.permutation(len(ent["context_tokens"]))[:n_ctx]
            for i in idx:
                toks.append(ent["context_tokens"][int(i)])
        for _ in range(int(rng.integers(2, 7))):
            toks.append(_FILLER[int(rng.integers(0, len(_FILLER)))])
        sentences.append((toks, mentions))
    return sentences


def _page_html(url: str, sentences, rng) -> bytes:
    paras = []
    for toks, _ in sentences:
        paras.append(f"  <p>{_html.escape(' '.join(toks))}</p>")
    noise_comment = "<!-- generated fixture; not real content -->"
    body = "\n".join(paras)
    doc = (
        "<html><head>"
        f"<title>{_html.escape(url)}</title>"
        "<style>p { margin: 0; }</style>"
        "</head><body>\n"
        f"<h1>Document {_html.escape(url.rsplit('/', 1)[-1])}</h1>\n"
        f"{noise_comment}\n"
        f"{body}\n"
        "<script>var tracker = 'noop';</script>\n"
        "</body></html>"
    )
    return doc.encode("utf-8")


def generate_fixture(spec: FixtureSpec):
    """Returns dict of pyarrow Tables: pages, kb_entities, mentions_gt,
    mention_pairs_gt."""
    rng = np.random.default_rng(spec.seed)
    ents = _build_entities(spec, rng)
    if spec.page_seed:
        rng = np.random.default_rng(spec.seed * 1000003 + spec.page_seed)

    urls, tss, htmls, texts, langs = [], [], [], [], []
    gt_rows = {k: [] for k in
               ("url", "mention_id", "surface", "type", "sent_no",
                "tok_start", "tok_end", "qid", "block_key")}
    epoch = np.datetime64("2024-01-01T00:00:00", "us")

    for p in range(spec.n_pages):
        url = f"https://site{p % 17}.example/page/{p:07d}"
        sentences = _page_sentences(spec, rng, ents, p)
        html_bytes = _page_html(url, sentences, rng)
        text = extract_text(html_bytes)
        urls.append(url)
        tss.append(epoch + np.timedelta64(p * 1337, "s"))
        htmls.append(html_bytes)
        texts.append(text)
        langs.append(["de", "en"][p % 2])
        # gold mentions: each sentence is one <p> → one extracted-text line;
        # sentences are the last len(sentences) lines of the page text.
        line_offset = len(text.split("\n")) - len(sentences)
        for s, (toks, mentions) in enumerate(sentences):
            for k, (a, b, surface, etype, qid) in enumerate(mentions):
                # content-derived id, same convention as the detector
                # (FIXTURES.md §7: ids from (line, span), not counters)
                mid = f"s{line_offset + s}t{a}"
                gt_rows["url"].append(url)
                gt_rows["mention_id"].append(mid)
                gt_rows["surface"].append(surface)
                gt_rows["type"].append(etype)
                gt_rows["sent_no"].append(line_offset + s)
                gt_rows["tok_start"].append(a)
                gt_rows["tok_end"].append(b)
                gt_rows["qid"].append(qid)
                gt_rows["block_key"].append(normalized_surface_key(surface))

    pages = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })

    kb = pa.table({
        "page_title": pa.array([e["page_title"] for e in ents]),
        "qid": pa.array([e["qid"] for e in ents]),
        "type": pa.array([e["type"] for e in ents]),
        "label": pa.array([e["label"] for e in ents]),
        "aliases": pa.array([e["aliases"] for e in ents],
                            pa.list_(pa.string())),
        "proba": pa.array([e["proba"] for e in ents], pa.float64()),
        "longitude": pa.array([e["longitude"] for e in ents], pa.float64()),
        "latitude": pa.array([e["latitude"] for e in ents], pa.float64()),
        "dateofbirth": pa.array([e["dateofbirth"] for e in ents],
                                pa.timestamp("us")),
        "inception": pa.array([e["inception"] for e in ents],
                              pa.timestamp("us")),
        "context_tokens": pa.array([e["context_tokens"] for e in ents],
                                   pa.list_(pa.string())),
        "family_id": pa.array([e["family_id"] for e in ents], pa.int32()),
    })

    mentions_gt = pa.table({k: pa.array(v) for k, v in gt_rows.items()})

    pairs = _build_gt_pairs(spec, rng, gt_rows)

    return {"pages": pages, "kb_entities": kb, "mentions_gt": mentions_gt,
            "mention_pairs_gt": pairs,
            "kb_sentences": _build_kb_sentences(ents),
            "redirects": _build_redirects(ents),
            "clef_tsv": _build_clef_file(urls, texts, gt_rows)}


def _build_clef_file(urls, texts, gt_rows) -> str:
    """CLEF-HIPE-format ground-truth file for the converter round trip
    (tags in the shared task's lowercase style ``B-pers``/``I-loc`` so
    the coarsening of ``clef_hipe_2020.py:113-124`` is exercised;
    sentence ends flagged ``EndOfSentence`` in MISC; one
    ``# document_id`` header per page)."""
    span_of: dict[tuple, list] = {}
    for i in range(len(gt_rows["url"])):
        span_of.setdefault(
            (gt_rows["url"][i], gt_rows["sent_no"][i]), []).append(
            (gt_rows["tok_start"][i], gt_rows["tok_end"][i],
             gt_rows["type"][i], gt_rows["qid"][i]))
    low = {"PER": "pers", "LOC": "loc", "ORG": "org"}
    out = ["\t".join(["TOKEN", "NE-COARSE-LIT", "NE-COARSE-METO",
                      "NE-FINE-LIT", "NE-FINE-METO", "NE-FINE-COMP",
                      "NE-NESTED", "NEL-LIT", "NEL-METO", "MISC"])]
    for url, text in zip(urls, texts):
        out.append(f"# document_id = {url}")
        out.append("# segment_iiif_link = _")
        for sent_no, line in enumerate(text.split("\n")):
            words = line.split(" ")
            tags = ["O"] * len(words)
            nels = ["-"] * len(words)
            for (a, b, etype, qid) in span_of.get((url, sent_no), []):
                for k in range(a, min(b, len(words))):
                    tags[k] = ("B-" if k == a else "I-") + low[etype]
                    nels[k] = qid
            for k, (w, tg, nl) in enumerate(zip(words, tags, nels)):
                misc = "EndOfSentence" if k == len(words) - 1 else "-"
                out.append("\t".join([w, tg, tg, "O", "O", "O", "O",
                                      nl, "-", misc]))
    return "\n".join(out) + "\n"


def _build_kb_sentences(ents) -> pa.Table:
    """The sentence KB: per-entity evidence sentences with marked entity
    spans (qid, sent_no, tokens, ent_pos, ent_end) — the fixture analog
    of the reference's one-time ``<lang>-ned.sqlite`` sentences/links
    build (``cli.py:657-685``).  The engine loads this table into the
    broadcast index (or co-shuffle joins it on the large-KB path)
    instead of synthesizing evidence at runtime."""
    from sbb_ned_ray.stages.pairs import synthesize_evidence
    from sbb_ned_ray.state.alias_index import normalize_token

    qids, sent_nos, toks_col, pos_col, end_col = [], [], [], [], []
    for e in ents:
        label_toks = [t for t in (normalize_token(x)
                                  for x in e["label"].split(" ")) if t]
        for i, (toks, pos, end) in enumerate(
                synthesize_evidence(label_toks, e["context_tokens"])):
            qids.append(e["qid"])
            sent_nos.append(i)
            toks_col.append(toks)
            pos_col.append(pos)
            end_col.append(end)
    return pa.table({
        "qid": pa.array(qids, pa.string()),
        "sent_no": pa.array(sent_nos, pa.int32()),
        "tokens": pa.array(toks_col, pa.list_(pa.string())),
        "ent_pos": pa.array(pos_col, pa.int32()),
        "ent_end": pa.array(end_col, pa.int32()),
    })


def _build_gt_pairs(spec, rng, gt):
    """Labeled mention pairs *at the same blocking key* (north_rule)."""
    by_key: dict[str, list[int]] = {}
    for i, k in enumerate(gt["block_key"]):
        by_key.setdefault(k, []).append(i)

    rows = {k: [] for k in ("url_a", "mention_id_a", "url_b", "mention_id_b",
                            "same_entity", "block_key")}
    keys = sorted(by_key)
    budget = spec.n_gt_pairs
    attempts = 0
    while budget > 0 and attempts < spec.n_gt_pairs * 20:
        attempts += 1
        key = keys[int(rng.integers(0, len(keys)))]
        idxs = by_key[key]
        if len(idxs) < 2:
            continue
        i, j = rng.choice(len(idxs), size=2, replace=False)
        a, b = idxs[int(i)], idxs[int(j)]
        rows["url_a"].append(gt["url"][a])
        rows["mention_id_a"].append(gt["mention_id"][a])
        rows["url_b"].append(gt["url"][b])
        rows["mention_id_b"].append(gt["mention_id"][b])
        rows["same_entity"].append(
            1 if gt["qid"][a] == gt["qid"][b] else 0)
        rows["block_key"].append(key)
        budget -= 1
    return pa.table({
        "url_a": pa.array(rows["url_a"]),
        "mention_id_a": pa.array(rows["mention_id_a"]),
        "url_b": pa.array(rows["url_b"]),
        "mention_id_b": pa.array(rows["mention_id_b"]),
        "same_entity": pa.array(rows["same_entity"], pa.int8()),
        "block_key": pa.array(rows["block_key"]),
    })


def materialize_fixture(spec: FixtureSpec, base_dir: str = "/tmp/sbb_ned_ray_fixtures") -> str:
    """Write the fixture tables to parquet under a fingerprinted dir (cached).

    ``pages`` is split into ``spec.n_files`` files so Ray Data reads
    several blocks.  Returns the directory path.
    """
    out = os.path.join(base_dir, spec.fingerprint())
    done_marker = os.path.join(out, "_FIXTURE_COMPLETE")
    if os.path.exists(done_marker):
        # backfill for dirs cached before the redirects table existed:
        # derived purely from the entity stream (same seed) — no page
        # regeneration, no fingerprint change
        rd_path = os.path.join(out, "redirects.parquet")
        if not os.path.exists(rd_path):
            ents = _build_entities(spec, np.random.default_rng(spec.seed))
            pq.write_table(_build_redirects(ents), rd_path + ".tmp")
            os.replace(rd_path + ".tmp", rd_path)
        return out
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    tables = generate_fixture(spec)
    pages = tables["pages"]
    os.makedirs(os.path.join(tmp, "pages"), exist_ok=True)
    n = pages.num_rows
    per = max(1, (n + spec.n_files - 1) // spec.n_files)
    # small row groups so ray.data.read_parquet(override_num_blocks=…)
    # can split files into more read tasks than there are files
    rg = max(32, per // 8)
    for i in range(spec.n_files):
        sl = pages.slice(i * per, per)
        if sl.num_rows == 0:
            break
        pq.write_table(sl, os.path.join(tmp, "pages", f"part-{i:04d}.parquet"),
                       row_group_size=rg)
    for name in ("kb_entities", "mentions_gt", "mention_pairs_gt",
                 "kb_sentences", "redirects"):
        pq.write_table(tables[name], os.path.join(tmp, f"{name}.parquet"))
    with open(os.path.join(tmp, "clef.tsv"), "w", encoding="utf-8") as f:
        f.write(tables["clef_tsv"])
    with open(os.path.join(tmp, "_FIXTURE_COMPLETE"), "w") as f:
        json.dump({"spec": asdict(spec), "version": FIXTURE_VERSION}, f)
    try:
        os.replace(tmp, out)
    except OSError:
        pass  # concurrent writer won the rename; its copy is identical
    return out


_SF_SPECS = {
    "sf0.001": FixtureSpec(n_pages=200, n_entities=120, n_gt_pairs=400),
    "sf0.01": FixtureSpec(n_pages=2000, n_entities=400, n_gt_pairs=2000,
                          n_files=8),
    "sf0.1": FixtureSpec(n_pages=20000, n_entities=1500, n_gt_pairs=8000,
                         n_files=32),
}


def spec_for_sf(sf_dir: str) -> FixtureSpec:
    name = os.path.basename(os.path.normpath(sf_dir))
    return _SF_SPECS.get(name, _SF_SPECS["sf0.01"])


def pages_dir_for_sf(sf_dir: str) -> str:
    """Deterministic synthetic pages fixture scaled to the given sf dir.

    The driver's testdata has no web-pages table; per the driver
    instruction the input-hint table is synthesised deterministically at
    a scale tied to the sf level.
    """
    return materialize_fixture(spec_for_sf(sf_dir))
