"""Speech data explorer: manifest statistics and error analysis.

Terminal/JSON equivalent of the reference's dash web app
(tools/speech_data_explorer/data_explorer.py:82-113: per-item duration /
word_rate / char_rate, corpus hours, vocabulary with counts, alphabet;
plus its error-analysis mode comparing `pred_text` against `text`).
A production TPU stack ships headless boxes, so the interactive plotly UI
becomes text histograms + machine-readable JSON (--json).

    python -m qasr_tpu.cli.data_explorer --manifest m.json [--json]
    python -m qasr_tpu.cli.data_explorer --manifest m.json --vocab_top 20
"""
from __future__ import annotations

import json
from argparse import ArgumentParser
from collections import defaultdict
from typing import Any, Dict, List


def load_data(manifest: str) -> Dict[str, Any]:
    """Per-item metrics + corpus aggregates (data_explorer.py:82-113)."""
    items: List[Dict[str, Any]] = []
    vocabulary: Dict[str, int] = defaultdict(int)
    alphabet = set()
    num_hours = 0.0
    with open(manifest) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            it = json.loads(line)
            text = it.get("text", "")
            dur = float(it["duration"])
            words = text.split()
            row = {
                "audio_filepath": it["audio_filepath"],
                "duration": round(dur, 2),
                "num_words": len(words),
                "num_chars": len(text),
                "word_rate": round(len(words) / dur, 2) if dur else 0.0,
                "char_rate": round(len(text) / dur, 2) if dur else 0.0,
            }
            if "pred_text" in it:
                from qasr_tpu.decode.ctc import edit_distance

                pred = it["pred_text"]
                row["pred_text"] = pred
                w_ed = edit_distance(pred.split(), words)
                c_ed = edit_distance(list(pred), list(text))
                row["word_edits"] = w_ed
                row["char_edits"] = c_ed
                row["WER"] = round(w_ed / max(len(words), 1), 4)
                row["CER"] = round(c_ed / max(len(text), 1), 4)
            items.append(row)
            num_hours += dur
            for w in words:
                vocabulary[w] += 1
            alphabet.update(text)
    out: Dict[str, Any] = {
        "num_items": len(items),
        "num_hours": round(num_hours / 3600.0, 6),
        "vocabulary_size": len(vocabulary),
        "alphabet": "".join(sorted(alphabet)),
        "vocabulary": dict(sorted(vocabulary.items(),
                                  key=lambda kv: -kv[1])),
        "items": items,
    }
    scored = [i for i in items if "WER" in i]
    if scored:
        # corpus-level rates: exact summed edit counts over summed
        # reference lengths (matches decode/ctc.py::WER semantics)
        tot_w = sum(i["num_words"] for i in scored)
        tot_c = sum(i["num_chars"] for i in scored)
        out["wer"] = round(sum(i["word_edits"] for i in scored)
                           / max(tot_w, 1), 4)
        out["cer"] = round(sum(i["char_edits"] for i in scored)
                           / max(tot_c, 1), 4)
    return out


def text_histogram(values, bins: int = 20, width: int = 40) -> List[str]:
    """ASCII histogram (the plotly histogram's terminal stand-in)."""
    if not values:
        return []
    lo, hi = min(values), max(values)
    if hi <= lo:
        hi = lo + 1.0
    step = (hi - lo) / bins
    counts = [0] * bins
    for v in values:
        counts[min(int((v - lo) / step), bins - 1)] += 1
    peak = max(counts)
    rows = []
    for b, c in enumerate(counts):
        bar = "#" * (c * width // max(peak, 1))
        rows.append(f"{lo + b * step:8.2f}..{lo + (b + 1) * step:8.2f} "
                    f"{c:6d} {bar}")
    return rows


def main(argv=None):
    p = ArgumentParser(description=__doc__)
    p.add_argument("--manifest", required=True)
    p.add_argument("--json", action="store_true",
                   help="print the full stats object as JSON")
    p.add_argument("--vocab_top", type=int, default=10)
    p.add_argument("--bins", type=int, default=12)
    args = p.parse_args(argv)

    stats = load_data(args.manifest)
    if args.json:
        print(json.dumps(stats))
        return stats

    print(f"items: {stats['num_items']}   hours: {stats['num_hours']:.2f}   "
          f"vocab: {stats['vocabulary_size']} words   "
          f"alphabet: {len(stats['alphabet'])} chars")
    print(f"alphabet: {stats['alphabet']!r}")
    for key, label in (("duration", "duration (s)"),
                       ("word_rate", "words/s"),
                       ("char_rate", "chars/s")):
        print(f"\n{label}:")
        for row in text_histogram([i[key] for i in stats["items"]],
                                  bins=args.bins):
            print("  " + row)
    top = list(stats["vocabulary"].items())[: args.vocab_top]
    print("\ntop words: " + ", ".join(f"{w}({c})" for w, c in top))
    if "wer" in stats:
        print(f"\nerror analysis: WER {stats['wer']:.4f}  "
              f"CER {stats['cer']:.4f}")
        worst = sorted((i for i in stats["items"] if "WER" in i),
                       key=lambda i: -i["WER"])[:5]
        for i in worst:
            print(f"  WER {i['WER']:.2f}  {i['audio_filepath']}")
    return stats


if __name__ == "__main__":
    main()
