"""
Mozilla Common Voice metadata loader (https://commonvoice.mozilla.org)
(reference: lidbox/meta/common_voice.py).

Corpus layout: ``<corpus_dir>/<lang>/{train,dev,test,validated}.tsv`` and
``<corpus_dir>/<lang>/clips/*.mp3``.
"""
import multiprocessing
import os

import pandas as pd

from lidbox_tpu.meta.utils import set_unique_index as _set_unique_index

SPLIT_NAMES = ("train", "dev", "test")
USE_COLUMNS = ("client_id", "path", "sentence")


def load_split(corpus_dir, lang, split, usecols=USE_COLUMNS):
    """One split tsv -> DataFrame with utterance ``id`` from the mp3 stem,
    absolute clip ``path``, and ``client_id`` prefixed with the language to
    avoid cross-dataset collisions (reference: common_voice.py:32-46).

    Vectorized over columns rather than the reference's per-row transform.
    """
    df = pd.read_csv(os.path.join(corpus_dir, lang, split + ".tsv"),
                     sep="\t", usecols=list(usecols))
    df = df.assign(label=lang, split=split)
    # filename stem, NOT str.split(".mp3"): pandas treats multi-char
    # split patterns as regex, so '.mp3' would match e.g. 'imp3' inside
    # a filename and corrupt the utterance id
    df["id"] = df["path"].str.rsplit(".", n=1).str[0]
    df["path"] = [os.path.join(corpus_dir, lang, "clips", p) for p in df["path"]]
    df["client_id"] = lang + "_" + df["client_id"].astype(str)
    return df


def load(corpus_dir, lang, usecols=USE_COLUMNS):
    """All train/dev/test splits of one language as a single id-indexed
    DataFrame (reference: common_voice.py:14-29)."""
    split_dfs = [load_split(corpus_dir, lang, s, usecols) for s in SPLIT_NAMES]
    return _set_unique_index(pd.concat(split_dfs)).sort_index()


def load_all(corpus_dir, langs, usecols=USE_COLUMNS, num_processes=None):
    """Multiple languages merged with globally unique utterance ids, loaded
    in parallel processes (reference: common_voice.py:49-58)."""
    if num_processes is None:
        num_processes = os.cpu_count()
    if num_processes and num_processes > 1 and len(langs) > 1:
        with multiprocessing.Pool(processes=num_processes) as pool:
            lang_dfs = pool.starmap(
                load, ((corpus_dir, lang, usecols) for lang in langs))
    else:
        lang_dfs = [load(corpus_dir, lang, usecols) for lang in langs]
    return pd.concat(lang_dfs, verify_integrity=True).sort_index()


def load_all_validated_data(meta, corpus_dir, lang, usecols=USE_COLUMNS):
    """Merge ``validated.tsv`` rows as extra training data, excluding any
    speaker already present in non-train splits; duplicates by id are
    dropped keeping the existing row (reference: common_voice.py:61-78)."""
    validated = load_split(corpus_dir, lang, "validated", usecols)
    existing_nontrain = meta.loc[meta["split"] != "train", "client_id"].unique()
    validated = validated[~validated["client_id"].isin(existing_nontrain)]
    validated = validated.assign(split="train")
    return _set_unique_index(
        pd.concat([meta.reset_index(), validated])
        .drop_duplicates(subset=["id"])).sort_index()
