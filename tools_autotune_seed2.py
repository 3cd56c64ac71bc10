"""Round-3: seed the new autotune candidate spaces (reduce / welford /
decode_page) with measured v5e winners, for merging into
autotune_defaults.json.  Run on the real TPU; results land in the user
cache (KFUNCA_AUTOTUNE_CACHE) and are printed as JSON."""
import json

from kfunca_tpu.runtime.autotune import autotune

if __name__ == "__main__":
    out = {}
    out["decode_page"] = autotune("decode_page", 8, 2048, 2048)
    out["reduce"] = autotune("reduce", 16384, 16384)
    out["welford"] = autotune("welford", 16387, 16387)
    print("RESULT " + json.dumps(out))
