"""Round-3 sweep: rectangular (bq, bk) tiles for the flash fwd/bwd kernels.

Uses kfunca.autotune's interleaved chained-slope discipline (runtime/autotune.py)
so the numbers survive relay drift and DCE.  Records winners into the per-chip
cache; if a rectangle beats the square 512^2 default, the defaults in
flash_attention.py get updated from this data.
"""
import json

from kfunca_tpu.runtime.autotune import autotune

FWD_CANDS = [
    {"bq": 512, "bk": 512},
    {"bq": 512, "bk": 1024},
    {"bq": 1024, "bk": 512},
    {"bq": 256, "bk": 1024},
    {"bq": 256, "bk": 512},
]
BWD_CANDS = [
    {"bq": 512, "bk": 512},
    {"bq": 512, "bk": 1024},
    {"bq": 1024, "bk": 512},
    {"bq": 256, "bk": 512},
    {"bq": 512, "bk": 256},
]

if __name__ == "__main__":
    out = {}
    out["fwd"] = autotune("attn_fwd", 4, 16, 2048, 128, candidates=FWD_CANDS)
    out["bwd"] = autotune("attn_bwd", 4, 16, 2048, 128, candidates=BWD_CANDS)
    print("RESULT " + json.dumps(out))
