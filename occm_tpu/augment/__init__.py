from occm_tpu.augment.rawboost import (
    norm_wav,
    firwin_bandstop,
    notch_from_draws,
    gen_notch_coeffs,
    fir_filter_centered,
    lnl_convolutive_noise,
    isd_additive_noise,
    ssi_additive_noise,
    process_rawboost,
    batch_rawboost,
)

__all__ = [
    "norm_wav",
    "firwin_bandstop",
    "notch_from_draws",
    "gen_notch_coeffs",
    "fir_filter_centered",
    "lnl_convolutive_noise",
    "isd_additive_noise",
    "ssi_additive_noise",
    "process_rawboost",
    "batch_rawboost",
]
