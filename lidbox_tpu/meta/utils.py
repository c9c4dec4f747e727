"""
Dataset-agnostic metadata utilities over pandas DataFrames
(reference: lidbox/meta/utils.py).

DataFrame contract: index = utterance id; required columns ``path, label,
split``; optional ``client_id`` (speaker), ``duration`` (seconds),
``target`` (int class).
"""
import collections
import itertools
import os
import wave
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pandas as pd

REQUIRED_COLUMNS = ("path", "label", "split")


def set_unique_index(df, col="id"):
    """set_index + uniqueness check with a readable error (pandas
    deprecated the built-in verify_integrity keyword). Shared by the
    metadata loaders and the prediction-DataFrame builders."""
    df = df.set_index(col, drop=True)
    if not df.index.is_unique:
        dupes = df.index[df.index.duplicated()].unique()[:5]
        raise ValueError(f"duplicate utterance ids, e.g. {list(dupes)}")
    return df


def verify_integrity(meta, max_threads=None):
    """Raise unless: all required columns present, no NaNs, every audio path
    exists on disk (checked with a thread pool), and splits are disjoint by
    speaker ``client_id`` (reference: lidbox/meta/utils.py:21-50)."""
    missing = set(REQUIRED_COLUMNS) - set(meta.columns)
    if missing:
        raise ValueError(f"{len(missing)} missing metadata columns: {sorted(missing)}")
    if meta.isna().any(axis=None):
        raise ValueError("NaNs in metadata")

    if max_threads is None or max_threads > 0:
        with ThreadPoolExecutor(max_workers=max_threads) as pool:
            exists = list(pool.map(os.path.exists, meta.path, chunksize=100))
    else:
        exists = [os.path.exists(p) for p in meta.path]
    num_invalid = sum(not ok for ok in exists)
    if num_invalid:
        raise FileNotFoundError(f"{num_invalid} audio paths do not exist")

    if "client_id" in meta.columns:
        split2spk = {s: set(meta.loc[meta["split"] == s, "client_id"].unique())
                     for s in meta.split.unique()}
        for a, b in itertools.combinations(split2spk, 2):
            common = split2spk[a] & split2spk[b]
            if common:
                raise ValueError(
                    f"splits {a!r} and {b!r} share {len(common)} speakers")


def _wav_duration(path):
    with wave.open(str(path), "rb") as f:
        return f.getnframes() / f.getframerate()


def _audio_duration(path):
    """Duration in seconds by suffix: wav header inspection, or an mpg123
    frame scan for mp3 (no decode; falls back to a full decode through
    whatever mp3 decoder features.io has when libmpg123 is unavailable)."""
    if str(path).lower().endswith(".mp3"):
        from lidbox_tpu import native
        if native.available() and native.mp3_supported():
            try:
                n, rate = native.mp3_info(path)
                return n / rate
            except ValueError:
                pass  # scan-rejected stream: fall through to a full decode
        from lidbox_tpu.features import io as audio_io
        sig, rate = audio_io.read_mp3(path)
        return len(sig) / rate
    return _wav_duration(path)


def read_audio_durations(meta, max_threads=None, duration_fn=_audio_duration):
    """Duration in seconds for each row's audio file, threaded; order follows
    the metadata index (reference: lidbox/meta/utils.py:53-67, which used
    miniaudio.get_file_info — here any ``duration_fn(path)`` can be plugged,
    defaulting to header inspection (wav) / frame scan (mp3))."""
    paths = list(meta.path)
    if max_threads is None or max_threads > 0:
        with ThreadPoolExecutor(max_workers=max_threads) as pool:
            durations = list(pool.map(duration_fn, paths, chunksize=1000))
    else:
        durations = [duration_fn(p) for p in paths]
    return np.asarray(durations, np.float32)


def random_oversampling(meta, copy_flag="is_copy", random_state=None):
    """Duration-weighted random oversampling: duplicate rows (with
    replacement) per minority label until each label's total speech duration
    approaches the majority label's; copies get ids suffixed ``_copy_<n>``
    and ``is_copy=True`` (reference: lidbox/meta/utils.py:73-115).

    Sample counts = (duration deficit) / (median utterance duration of the
    label), as in the reference.
    """
    if copy_flag not in meta.columns:
        meta = meta.assign(**{copy_flag: False})
    dur = meta["duration"].astype(float)
    total_by_label = dur.groupby(meta["label"]).sum()
    median_by_label = dur.groupby(meta["label"]).median()
    target_label = total_by_label.idxmax()
    deficits = total_by_label.loc[target_label] - total_by_label
    sample_sizes = (deficits / median_by_label).astype(int)

    copies = []
    for label, n in sample_sizes.items():
        if label == target_label or n <= 0:
            continue
        sampled = meta[meta["label"] == label].sample(
            n=int(n), replace=True, random_state=random_state)
        sampled = sampled.reset_index(names="id")
        sampled["id"] = [f"{row_id}_copy_{i}"
                         for i, row_id in enumerate(sampled["id"])]
        sampled[copy_flag] = True
        copies.append(sampled.set_index("id"))
    if not copies:
        return meta.sort_index()
    return pd.concat([pd.concat(copies), meta], verify_integrity=True).sort_index()


def random_oversampling_on_split(meta, split, random_state=None):
    """Oversample only rows of one split, keep the rest untouched
    (reference: lidbox/meta/utils.py:118-122)."""
    meta = meta.assign(is_copy=False)
    part = meta[meta["split"] == split]
    rest = meta[meta["split"] != split]
    return pd.concat([random_oversampling(part, random_state=random_state), rest],
                     verify_integrity=True).sort_index()


def random_undersampling(meta, target_label, random_state=None):
    """Duration-weighted undersampling: labels with more total speech than
    ``target_label`` are sampled down (without replacement) to
    target-duration / median-duration rows
    (reference: lidbox/meta/utils.py:125-152)."""
    dur = meta["duration"].astype(float)
    total_by_label = dur.groupby(meta["label"]).sum()
    median_by_label = dur.groupby(meta["label"]).median()
    target_dur = total_by_label.loc[target_label]

    sampled_parts = []
    sampled_labels = []
    for label, label_dur in total_by_label.items():
        if label_dur > target_dur:
            n = int(target_dur / median_by_label.loc[label])
            label_meta = meta[meta["label"] == label]
            if n > len(label_meta):
                raise ValueError(
                    f"sample size {n} larger than population {len(label_meta)}")
            sampled_parts.append(label_meta.sample(
                n=n, replace=False, random_state=random_state))
            sampled_labels.append(label)
    if not sampled_parts:
        return meta.sort_index()
    rest = meta[~meta["label"].isin(sampled_labels)]
    return pd.concat([pd.concat(sampled_parts), rest],
                     verify_integrity=True).sort_index()


def random_undersampling_on_split(meta, split, target_label, random_state=None):
    """(reference: lidbox/meta/utils.py:155-158)"""
    part = meta[meta["split"] == split]
    rest = meta[meta["split"] != split]
    return pd.concat(
        [random_undersampling(part, target_label, random_state=random_state), rest],
        verify_integrity=True).sort_index()


def generate_label2target(meta):
    """Labels to integer targets by lexicographic enumeration; adds a
    ``target`` column (reference: lidbox/meta/utils.py:161-169)."""
    label2target = collections.OrderedDict(
        (label, target) for target, label in enumerate(sorted(meta.label.unique())))
    meta = meta.assign(target=np.asarray(
        [label2target[l] for l in meta.label], np.int32))
    return meta, label2target
