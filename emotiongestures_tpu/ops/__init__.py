from .mel import (  # noqa: F401
    mel_filterbank,
    power_to_db,
    extract_melspectrogram,
    melspectrogram,
    calc_spectrogram_length_from_motion_length,
    make_audio_fixed_length,
)
