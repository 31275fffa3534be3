"""vt_tools adapter over artspeech_tpu.core.constants (the reference
declares vt_tools as an external editable install, requirements.txt:36)."""

from artspeech_tpu.core.constants import (  # noqa: F401
    ARYTENOID_CARTILAGE,
    COLORS,
    EPIGLOTTIS,
    LOWER_INCISOR,
    LOWER_LIP,
    PHARYNX,
    SOFT_PALATE,
    SOFT_PALATE_MIDLINE,
    THYROID_CARTILAGE,
    TONGUE,
    UPPER_INCISOR,
    UPPER_LIP,
    VOCAL_FOLDS,
)
