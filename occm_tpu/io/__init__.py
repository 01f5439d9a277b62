from occm_tpu.io.protocols import (
    parse_train_protocol,
    parse_eval_protocol,
    parse_metadata_labels,
    parse_metadata_dict,
    gen_spoof_list,
)
from occm_tpu.io.scorefiles import (
    write_score_line_1c,
    write_score_line_2c,
    read_comma_scores,
    read_utt_scores,
    write_utt_score_line,
)

__all__ = [
    "parse_train_protocol",
    "parse_eval_protocol",
    "parse_metadata_labels",
    "parse_metadata_dict",
    "gen_spoof_list",
    "write_score_line_1c",
    "write_score_line_2c",
    "read_comma_scores",
    "read_utt_scores",
    "write_utt_score_line",
]
