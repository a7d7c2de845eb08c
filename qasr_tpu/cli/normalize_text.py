"""Text-normalization CLI: written -> spoken form.

Covers both reference entry points in one module
(tools/text_normalization/run_predict.py:54-79 and
run_evaluate.py:33-107):

    # predict: normalize a file of sentences, one per line
    python -m qasr_tpu.cli.normalize_text --input in.txt --output out.txt

    # evaluate on the Google/Kaggle text-normalization format
    python -m qasr_tpu.cli.normalize_text --evaluate --input data.tsv \
        [--cat MEASURE]
"""
from __future__ import annotations

from argparse import ArgumentParser
from time import perf_counter
from typing import List

from qasr_tpu.text.normalize import (
    KNOWN_TYPES, NORMALIZERS, evaluate_accuracy, load_kaggle_text_norm_file,
    training_data_to_sentences, training_data_to_tokens,
)


def load_file(path: str) -> List[str]:
    with open(path) as fp:
        return [line.strip() for line in fp if line]


def write_file(path: str, data: List[str]) -> None:
    with open(path, "w") as fp:
        for line in data:
            fp.write(line + "\n")


def run_predict(args) -> None:
    normalizer = NORMALIZERS[args.normalizer]
    data = load_file(args.input)
    print(f"- Data: {len(data)} sentences")
    t0 = perf_counter()
    pred = normalizer(data, verbose=args.verbose)
    dt = perf_counter() - t0
    print(f"- Finished in {dt:.3f} s ({len(data) / max(dt, 1e-9):.1f} "
          f"sentences/s)")
    write_file(args.output, pred)


def run_evaluate(args) -> None:
    normalizer = NORMALIZERS[args.normalizer]
    data = load_kaggle_text_norm_file(args.input)
    if args.cat is None:
        un, gold = training_data_to_sentences(data)
        print(f"Sentence level: {len(un)} sentences")
        acc = evaluate_accuracy(normalizer(un), gold, un,
                                verbose=args.verbose)
        print(f"- Accuracy: {acc}")
    per_type = training_data_to_tokens(data, category=args.cat)
    token_acc = {}
    for token_type, (un, gold) in per_type.items():
        if token_type not in KNOWN_TYPES:
            raise ValueError("Unexpected token type: " + token_type)
        token_acc[token_type] = evaluate_accuracy(
            normalizer(un), gold, un, verbose=args.verbose)
        print(f"- {token_type}: n={len(un)} "
              f"accuracy={token_acc[token_type]}")
    total = sum(len(v[0]) for v in per_type.values())
    if total:
        weighted = sum(len(per_type[t][0]) * a for t, a in token_acc.items())
        print(f"- Token accuracy (weighted): {weighted / total}")


def main(argv=None) -> None:
    p = ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, type=str)
    p.add_argument("--output", type=str, default=None,
                   help="output file (predict mode)")
    p.add_argument("--normalizer", default="nemo",
                   choices=sorted(NORMALIZERS.keys()))
    p.add_argument("--evaluate", action="store_true",
                   help="input is Google/Kaggle text-norm TSV; print "
                        "sentence- and token-level accuracy")
    p.add_argument("--cat", type=str, default=None, choices=KNOWN_TYPES,
                   help="restrict token-level evaluation to one class")
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args(argv)
    if args.evaluate:
        run_evaluate(args)
    else:
        if args.output is None:
            p.error("--output is required unless --evaluate")
        run_predict(args)


if __name__ == "__main__":
    main()
