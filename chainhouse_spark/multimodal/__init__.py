"""Multimodal columns: image/audio/video as opaque binary payloads with typed
metadata, plus mapInPandas decode / feature-extraction / resize / frame-sample
operators (SURVEY.md §2.6 beyond-parity surface).
"""

from chainhouse_spark.multimodal.assets import synth_assets, assets_oracle_sql  # noqa: F401
from chainhouse_spark.multimodal.ops import (  # noqa: F401
    audio_features,
    frame_sample,
    image_features,
    image_resize,
)
