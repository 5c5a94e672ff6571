"""Retrieval QUALITY campaign: recall@10 per embedding provider.

The parity campaign (tests/test_eval_parity.py) proves the device path
returns bit-identical rankings to the float64 oracle — but says nothing
about whether those rankings are GOOD. This module measures the number a
user actually cares about: the recall@10 hit rate (expected document
retrieved in the top 10, the eval semantics of
src/OmniRecall.App/src/app/pages/eval/eval.page.ts:108-175) on one fixed
corpus + case set (eval/corpus.py), across embedding providers:

- ``hash`` — the deterministic feature-hashed bag-of-words embedder
  (models/hash_embedder.py), the out-of-box local provider,
- ``local-untrained`` — the transformer encoder at random init
  (models/encoder.py),
- ``local-trained`` — the same encoder contrastively fine-tuned ON THE
  CORPUS ITSELF (the train-your-own-memory-embedder workflow;
  tools/train_embedder_demo.py is the toy version). Training pairs use
  paraphrase templates DISJOINT from the three eval templates, so the
  gain reflects domain adaptation to the corpus, not memorizing the
  eval questions.

A remote provider (Gemini) cannot be measured here — the environment has
no egress — but plugs into the same harness via any ``embed`` callable.

Scoring runs through the exact oracle engine: quality differences are
then attributable to the EMBEDDINGS alone (the parity campaign already
pins device == oracle).
"""

from __future__ import annotations

import random

import numpy as np

from omni_recall_tpu.config import EngineOptions
from omni_recall_tpu.eval.corpus import DIM, NOW, build_corpus, generate_cases
from omni_recall_tpu.eval.harness import to_topic
from omni_recall_tpu.models import hash_embedder
from omni_recall_tpu.search.engine import RecallEngine

# paraphrase templates for TRAINING pairs — deliberately disjoint from the
# three eval templates in eval/corpus.py generate_cases. Question-shaped
# variants teach the encoder that interrogative filler carries no content
# (real queries are questions); none shares an eval template's surface form.
_TRAIN_TEMPLATES = (
    "notes on {t}",
    "information regarding {t}",
    "tell me about {t}",
    "{t} overview",
    "facts concerning {t}",
    "where do my notes mention {t}?",
    "can you look up {t} for me?",
    "is there anything written on {t}?",
    "show me every record covering {t}",
    "{t} - find the relevant entries",
)


def finetune_encoder_on_corpus(
    store, cfg=None, steps: int = 200, seed: int = 0, batch: int = 64,
):
    """Contrastive (InfoNCE, in-batch negatives) fine-tune of the local
    encoder on (topic-paraphrase query, chunk content) pairs drawn from the
    corpus documents. Returns (params, cfg)."""
    import jax

    from omni_recall_tpu.models import encoder

    cfg = cfg or encoder.EncoderConfig(
        vocab_size=8192, d_model=128, n_layers=2, n_heads=4, d_ff=256,
        max_len=48, out_dim=DIM,
    )
    rng = random.Random(seed)

    def _rand_word():
        import string as _s

        return "".join(rng.choices(_s.ascii_lowercase, k=rng.randint(3, 9)))

    def _augment(q: str) -> str:
        # filler-word augmentation: real queries carry words the corpus has
        # never seen (interrogative scaffolding, typos); their hashed token
        # embeddings sit at random init and dilute the mean-pooled topic
        # signal. Injecting random unseen words at TRAIN time makes that
        # noise in-distribution, so the encoder learns to keep the topic
        # component dominant under arbitrary filler.
        words = q.split()
        for _ in range(rng.randint(0, 3)):
            words.insert(rng.randint(0, len(words)), _rand_word())
        return " ".join(words)

    pairs: list[tuple[str, str]] = []
    for doc in store.list_documents(10**6):
        chunks = sorted(
            store.get_chunks_by_document_id(doc.id), key=lambda c: c.chunk_index
        )
        if not chunks:
            continue
        topic = to_topic(chunks[0].content)
        for c in chunks:
            tmpl = rng.choice(_TRAIN_TEMPLATES)
            pairs.append((_augment(tmpl.format(t=topic)), c.content))

    import optax

    params = encoder.init_params(jax.random.PRNGKey(seed), cfg)
    optimizer, train_step = encoder.make_train_step(cfg, optax.adamw(3e-4))
    opt_state = optimizer.init(params)
    step_fn = jax.jit(train_step)
    nrng = np.random.default_rng(seed)
    order = np.arange(len(pairs))
    import jax.numpy as jnp

    for _ in range(steps):
        nrng.shuffle(order)
        idx = order[:batch]
        q_ids = jnp.asarray(
            encoder.tokenize_batch([pairs[i][0] for i in idx], cfg)
        )
        c_ids = jnp.asarray(
            encoder.tokenize_batch([pairs[i][1] for i in idx], cfg)
        )
        params, opt_state, _ = step_fn(params, opt_state, q_ids, c_ids)
    return params, cfg


def _encoder_embed_fn(params, cfg):
    import jax.numpy as jnp

    from omni_recall_tpu.models import encoder

    def embed(text: str):
        ids = jnp.asarray(encoder.tokenize_batch([text], cfg))
        return np.asarray(encoder.forward(params, ids, cfg))[0].tolist()

    return embed


def _recall_at_10(embed) -> float:
    store, _ = build_corpus(embed=embed)
    cases = generate_cases(store)
    engine = RecallEngine(
        store, None, EngineOptions(backend="oracle", recent_window=0)
    )
    hits = 0
    for case in cases:
        res = engine.search(case.question, embed(case.question), case.top_k, now=NOW)
        files = set()
        for h in res:
            doc = store.get_document(h.chunk.document_id)
            if doc:
                files.add(doc.file_name)
        hits += case.expected_file in files
    return hits / len(cases)


def evaluate_embedders(steps: int = 200, seed: int = 0) -> dict[str, float]:
    """recall@10 per provider on the shared corpus/case set. The trained
    encoder must beat the hash baseline (asserted by
    tests/test_eval_quality.py) — the quality target the parity campaign
    cannot see."""
    from omni_recall_tpu.models import encoder  # noqa: F401

    results: dict[str, float] = {}
    results["hash"] = _recall_at_10(
        lambda text: hash_embedder.embed_text(text, DIM)
    )
    store, _ = build_corpus()  # texts only; embeddings replaced per provider
    import jax

    from omni_recall_tpu.models import encoder as enc

    cfg = enc.EncoderConfig(
        vocab_size=8192, d_model=128, n_layers=2, n_heads=4, d_ff=256,
        max_len=48, out_dim=DIM,
    )
    untrained = enc.init_params(jax.random.PRNGKey(seed), cfg)
    results["local-untrained"] = _recall_at_10(_encoder_embed_fn(untrained, cfg))
    trained, cfg_t = finetune_encoder_on_corpus(store, cfg=cfg, steps=steps, seed=seed)
    results["local-trained"] = _recall_at_10(_encoder_embed_fn(trained, cfg_t))
    return results


def main() -> None:  # pragma: no cover - CLI convenience
    import json

    print(json.dumps(evaluate_embedders(), indent=1))


if __name__ == "__main__":
    main()
