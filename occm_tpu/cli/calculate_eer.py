"""EER CLI for `utt score` files (reference: calculate_eer.py:28-39)."""

from __future__ import annotations

import argparse

from occm_tpu.evaluate import calculate_eer_merged


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="EER from utt-score files merged with a 5-col protocol"
    )
    parser.add_argument(
        "--eval_protocol_file", type=str,
        default="./database/protocols/PartialSpoof_LA_cm_protocols/"
                "PartialSpoof.LA.cm.eval.trl.txt",
    )
    parser.add_argument(
        "--score_file", type=str, default="./se_resnet34_eval_scores.txt"
    )
    args = parser.parse_args(argv)

    print(f"eval_protocol_file = {args.eval_protocol_file}")
    print(f"score_file = {args.score_file}")
    eer, threshold = calculate_eer_merged(
        args.eval_protocol_file, args.score_file
    )
    print(f"EER = {eer * 100.0}, threshold = {threshold}")


if __name__ == "__main__":
    main()
