"""Test configuration: run on a virtual 8-device CPU mesh.

Must set env vars before the first jax import anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the sandbox presets axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# the sandbox's sitecustomize force-registers the axon TPU backend and
# overwrites jax_platforms; undo that before any backend initializes
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from rucene_tpu import Document, StoredField, StringField, TextField
from rucene_tpu.index.memory import SegmentBuffer


def make_docs(texts: list[str], ids: list[str] | None = None) -> list[Document]:
    docs = []
    for i, t in enumerate(texts):
        d = Document()
        d.add(TextField("body", t, stored=False))
        if ids is not None:
            d.add(StringField("id", ids[i], stored=True))
        d.add(StoredField("raw", t))
        docs.append(d)
    return docs


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


WORDS = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "search",
    "engine", "index", "query", "score", "block", "tensor", "device", "merge",
    "segment", "commit", "delta", "pack", "unpack", "term", "phrase", "boolean",
]


def random_corpus(rng: np.random.Generator, n_docs: int, min_len=3, max_len=40) -> list[str]:
    out = []
    for _ in range(n_docs):
        n = int(rng.integers(min_len, max_len + 1))
        out.append(" ".join(rng.choice(WORDS, size=n)))
    return out


@pytest.fixture(scope="session")
def small_index():
    """A ~200-doc single-segment in-RAM index over a random word corpus."""
    rng = np.random.default_rng(7)
    texts = random_corpus(rng, 200)
    buf = SegmentBuffer()
    for d in make_docs(texts):
        buf.add_document(d)
    return buf.finish(), texts
