"""Serve a model over HTTP: tokenizer + engine + OpenAI-style API.

Hermetic by default (tiny random model + a BPE tokenizer trained on an
in-script corpus); point --hf at a local Llama/Mistral/Qwen2/GPT-2/
GPT-NeoX checkpoint directory to serve real weights.

    python examples/serve_api.py --port 8000 &
    curl -s localhost:8000/v1/models
    curl -s localhost:8000/v1/completions \
        -d '{"prompt": "the sea", "max_tokens": 24, "temperature": 0.7}'
    curl -sN localhost:8000/v1/completions \
        -d '{"prompt": "the wind", "max_tokens": 24, "stream": true}'
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from kfunca_tpu.models.api_server import ApiServer
from kfunca_tpu.models.serve import InferenceServer
from kfunca_tpu.models.tokenizer import BPETokenizer
from kfunca_tpu.models.transformer import TransformerConfig, init_params

CORPUS = ("the sea rose and the wind sang over the quiet harbor "
          "the gulls turned in the morning light ") * 40


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--hf", default=None,
                    help="local HF checkpoint dir (needs its own tokenizer)")
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--pages", type=int, default=256)
    args = ap.parse_args()

    if args.hf:
        from kfunca_tpu.models.hf import from_hf

        params, cfg = from_hf(args.hf)
        tok = None  # bring your own tokenizer for real checkpoints
    else:
        cfg = TransformerConfig(vocab_size=512, d_model=128, n_heads=4,
                                n_layers=2, d_ff=256, dtype="float32",
                                max_seq_len=512)
        params = init_params(jax.random.PRNGKey(0), cfg)
        tok = BPETokenizer.train(CORPUS, cfg.vocab_size)

    engine = InferenceServer(params, cfg, batch_slots=args.slots,
                             n_pages=args.pages, page_size=16)
    srv = ApiServer(engine, tokenizer=tok, host=args.host,
                    port=args.port).start()
    print(f"serving on http://{srv.host}:{srv.port}  "
          f"(text={'yes' if tok else 'no — send token ids'})")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        srv.shutdown()


if __name__ == "__main__":
    main()
