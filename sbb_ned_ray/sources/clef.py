"""CLEF-HIPE TSV converters: shared-task files ↔ the engine's "neat"
TSV ↔ mention rows.

Reference: ``ground_truth/clef_hipe_2020.py:21-259`` /
``clef_hipe_2022.py:19-253`` — CLEF files are tab-separated token rows
(columns ``TOKEN NE-COARSE-LIT … NE-NESTED NEL-LIT NEL-METO MISC``)
interleaved with ``#`` metadata lines (``# document_id = …``,
``# segment_iiif_link = …``).  The conversion semantics reproduced
here:

* tag coarsening: ``NE-COARSE-LIT[:5].upper()`` (``B-pers`` →
  ``B-PER``), anything whose type is not in {PER, LOC, ORG} → ``O``
  (``clef_hipe_2020.py:113-124``);
* control characters stripped from tokens, empty tokens dropped
  (``:127-133``);
* the "neat" output columns ``No. TOKEN NE-TAG NE-EMB ID url_id left
  right top bottom`` with per-document ``#`` headers preserved
  (``:105-144``);
* back-conversion lowercases the type suffixes and re-adds the CLEF
  column set with ``# segment_iiif_link`` separators (``:155-197``).

Sentence boundaries come from the ``MISC`` column's ``EndOfSentence``
flag when present (HIPE data has it); documents WITHOUT flags are
resequenced by the deterministic rule-based splitter in
:mod:`sbb_ned_ray.functions.sentence_split` — the role SoMaJo plays in
the reference (clef_hipe_2020.py:62-65), implemented from the standard
published boundary heuristics instead of the dependency.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
import pyarrow as pa

CLEF_COLUMNS = ["TOKEN", "NE-COARSE-LIT", "NE-COARSE-METO", "NE-FINE-LIT",
                "NE-FINE-METO", "NE-FINE-COMP", "NE-NESTED", "NEL-LIT",
                "NEL-METO", "MISC"]
NEAT_COLUMNS = ["No.", "TOKEN", "NE-TAG", "NE-EMB", "ID", "url_id",
                "left", "right", "top", "bottom"]
ENTITY_TYPES = ("PER", "LOC", "ORG")


def _is_metadata_line(line: str) -> bool:
    """CLEF metadata lines have the ``# key = value`` shape
    (``# document_id = …``, ``# segment_iiif_link = …``).  A token row
    whose TOKEN itself starts with ``#`` — OCR noise ``#``,
    ``#redirect`` — is NOT metadata: it is tab-separated immediately
    after the token and carries no ``=`` before the first tab (ADVICE
    round 2: blanket ``startswith('#')`` silently dropped such tokens
    from the round trip)."""
    return line.startswith("# ") and "=" in line.split("\t", 1)[0]


def _strip_control(tok: str) -> str:
    return "".join(c for c in str(tok)
                   if unicodedata.category(c) != "Cc")


def _coarsen(tag: str) -> str:
    """``B-pers`` → ``B-PER``; unknown types → ``O``
    (clef_hipe_2020.py:113-124)."""
    if not tag or tag == "O" or pd.isna(tag):
        return "O"
    t = str(tag)[:5].upper()
    return t if t[2:5] in ENTITY_TYPES else "O"


def _derive_sentence_bounds(df: pd.DataFrame) -> pd.DataFrame:
    """Documents with NO ``EndOfSentence`` flag anywhere get sentence
    boundaries from the rule-based splitter
    (:mod:`sbb_ned_ray.functions.sentence_split`) — the reference
    resequences such files with SoMaJo (clef_hipe_2020.py:62-65).
    Documents that carry flags keep them untouched."""
    if df.empty:
        return df
    from sbb_ned_ray.functions.sentence_split import resequence_token_ids

    if "MISC" not in df.columns:
        df["MISC"] = "-"
    df["MISC"] = df["MISC"].fillna("-")
    out = []
    for _, part in df.groupby("url_id", sort=False):
        if not part["MISC"].str.contains("EndOfSentence").any():
            part = part.copy()
            sent_nos, token_nos = resequence_token_ids(
                part["TOKEN"].astype(str).tolist())
            part["sent_no"] = sent_nos
            if "token_no" in part.columns:
                part["token_no"] = token_nos
            last = part.groupby("sent_no", sort=False).tail(1).index
            part.loc[last, "MISC"] = "EndOfSentence"
        out.append(part)
    return pd.concat(out, ignore_index=True)


def read_clef_tsv(path: str) -> tuple[list[str], pd.DataFrame]:
    """Parse a CLEF-HIPE file → (document header lines, token frame).

    Frame columns: ``url`` (from ``# document_id``), ``url_id``,
    ``sent_no`` (EndOfSentence-delimited, counted per document),
    ``token_no`` (within sentence) + the CLEF columns present.
    """
    headers: list[str] = []
    rows: list[dict] = []
    cols: list[str] | None = None
    url, url_id = None, -1
    sent_no, token_no = 0, 0
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            if cols is None:
                cols = line.split("\t")
                continue
            if _is_metadata_line(line):
                if "document_id" in line:
                    headers.append(line)
                    url = line.split("=", 1)[1].strip()
                    url_id += 1
                    sent_no, token_no = 0, 0
                continue
            vals = line.split("\t")
            row = dict(zip(cols, vals))
            row["url"] = url
            row["url_id"] = url_id
            row["sent_no"] = sent_no
            row["token_no"] = token_no
            rows.append(row)
            if "EndOfSentence" in row.get("MISC", ""):
                sent_no += 1
                token_no = 0
            else:
                token_no += 1
    return headers, _derive_sentence_bounds(pd.DataFrame(rows))


def clef_to_neat(clef_path: str, tsv_path: str) -> None:
    """CLEF file → "neat" TSV (clef2tsv semantics): coarsened tags,
    control chars stripped, empty tokens dropped, per-document
    ``# document_id`` headers, ``No.`` = within-sentence index."""
    headers, df = read_clef_tsv(clef_path)
    if df.empty:
        with open(tsv_path, "w", encoding="utf-8") as f:
            f.write("\t".join(NEAT_COLUMNS) + "\n")
        return
    df["TOKEN"] = df["TOKEN"].map(_strip_control)
    df = df.loc[df["TOKEN"].str.len() > 0].copy()
    # re-assert the sentence-end flag on the last SURVIVING token of
    # each sentence (the drop may have removed the flagged token)
    df["MISC"] = "-"
    last = df.groupby(["url_id", "sent_no"], sort=False).tail(1).index
    df.loc[last, "MISC"] = "EndOfSentence"
    df["NE-TAG"] = df["NE-COARSE-LIT"].map(_coarsen)
    df["NE-EMB"] = df.get("NE-NESTED", pd.Series(dtype=object)) \
        .map(_coarsen) if "NE-NESTED" in df.columns else "O"
    df["ID"] = df.get("NEL-LIT", "-")
    df["No."] = df["token_no"]
    df["left"] = df["right"] = df["top"] = df["bottom"] = 0
    # MISC travels as a trailing column so sentence boundaries survive
    # the round trip (the reference re-derives them with SoMaJo instead)
    out_cols = NEAT_COLUMNS + ["MISC"]
    with open(tsv_path, "w", encoding="utf-8") as f:
        f.write("\t".join(out_cols) + "\n")
        for uid, part in df.groupby("url_id", sort=False):
            f.write(headers[uid] + "\n")
            part[out_cols].to_csv(f, sep="\t", index=False, header=False,
                                  quoting=3)


def read_neat_tsv(path: str) -> pd.DataFrame:
    """"Neat" TSV → token frame (url, url_id, sent_no, token_no,
    TOKEN, NE-TAG, NE-EMB, ID, MISC)."""
    rows: list[dict] = []
    cols: list[str] | None = None
    url, url_id = None, -1
    sent_no = 0
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            if cols is None:
                cols = line.split("\t")
                continue
            if _is_metadata_line(line):
                if "document_id" in line:
                    url = line.split("=", 1)[1].strip()
                    url_id += 1
                    sent_no = 0
                continue
            row = dict(zip(cols, line.split("\t")))
            row["url"] = url
            row["url_id"] = url_id
            row["sent_no"] = sent_no
            rows.append(row)
            if "EndOfSentence" in row.get("MISC", ""):
                sent_no += 1
    return _derive_sentence_bounds(pd.DataFrame(rows))


def neat_to_clef(tsv_path: str, out_path: str) -> None:
    """"Neat" TSV → CLEF file (tsv2clef semantics): type suffixes
    lowercased (``-PER`` → ``-pers``, ``-LOC`` → ``-loc``, ``-ORG`` →
    ``-org``), full CLEF column set restored, ``# document_id`` and
    ``# segment_iiif_link`` headers emitted."""
    df = read_neat_tsv(tsv_path)

    def uncoarsen(tag: str) -> str:
        return str(tag).replace("-PER", "-pers").replace("-LOC", "-loc") \
            .replace("-ORG", "-org")

    with open(out_path, "w", encoding="utf-8") as f:
        f.write("\t".join(CLEF_COLUMNS) + "\n")
        if df.empty:
            return
        for _, part in df.groupby("url_id", sort=False):
            f.write(f"# document_id = {part['url'].iloc[0]}\n")
            f.write("# segment_iiif_link = _\n")
            out = pd.DataFrame({
                "TOKEN": part["TOKEN"],
                "NE-COARSE-LIT": part["NE-TAG"].map(uncoarsen),
                "NE-COARSE-METO": part["NE-TAG"].map(uncoarsen),
                "NE-FINE-LIT": "O",
                "NE-FINE-METO": "O",
                "NE-FINE-COMP": "O",
                "NE-NESTED": part["NE-EMB"].map(uncoarsen),
                "NEL-LIT": part["ID"],
                "NEL-METO": "-",
                "MISC": part["MISC"] if "MISC" in part.columns else "-",
            })
            out.to_csv(f, sep="\t", index=False, header=False, quoting=3)


def neat_tokens_table(tsv_path: str) -> pa.Table:
    """"Neat" TSV → Arrow rows (url, sent_no, tokens:list<struct>)
    ready for :func:`sbb_ned_ray.stages.mentions.parse_ner_batch` —
    the bridge from the file format into the distributed parse."""
    df = read_neat_tsv(tsv_path)
    urls, sents, toks = [], [], []
    if not df.empty:
        for (url, sent_no), g in df.groupby(["url", "sent_no"],
                                            sort=False):
            urls.append(url)
            sents.append(int(sent_no))
            toks.append([
                {"word": w, "prediction": t,
                 "gt": (i if isinstance(i, str) and i not in ("-", "")
                        else None)}
                for w, t, i in zip(g["TOKEN"], g["NE-TAG"], g["ID"])])
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "sent_no": pa.array(sents, pa.int32()),
        "tokens": pa.array(toks),
    })
