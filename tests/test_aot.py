"""AOT artifact store (bellman_tpu/utils/aot.py): record on miss,
deserialize on hit, fingerprint keying. Runs on CPU with a tmp store
(the production store holds ("tpu",)-platform artifacts recorded by the
bench; the mechanics under test are platform-independent)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bellman_tpu.utils import aot


@functools.partial(jax.jit, static_argnums=(0,))
def _toy(k, x, y):
    return x * jnp.uint32(k) + y


@pytest.fixture
def store(tmp_path, monkeypatch):
    monkeypatch.setenv("BELLMAN_TPU_AOT_DIR", str(tmp_path))
    monkeypatch.setenv("BELLMAN_TPU_AOT", "1")
    monkeypatch.setenv("BELLMAN_TPU_AOT_RECORD", "1")
    aot._COMPILED.clear()
    yield tmp_path
    aot._COMPILED.clear()


def test_record_then_hit(store):
    x = jnp.ones((8, 128), jnp.uint32)
    y = jnp.full((8, 128), 5, jnp.uint32)

    before = aot.stats()["recorded"]
    exe = aot.compiled("toy", (3,), (x, y), _toy, static_args=(3,),
                       platforms=("cpu",))
    assert aot.stats()["recorded"] == before + 1
    files = list(store.glob("toy-*.jaxexp"))
    assert len(files) == 1
    np.testing.assert_array_equal(np.asarray(exe(x, y)), 3 + 5)

    # fresh process simulation: drop the in-memory cache, hit the file
    aot._COMPILED.clear()
    h0 = aot.stats()["hits"]
    exe2 = aot.compiled("toy", (3,), (x, y), _toy, static_args=(3,),
                        platforms=("cpu",))
    assert aot.stats()["hits"] == h0 + 1
    np.testing.assert_array_equal(np.asarray(exe2(x, y)), 3 + 5)


def test_distinct_statics_distinct_artifacts(store):
    x = jnp.ones((8, 128), jnp.uint32)
    y = jnp.ones((8, 128), jnp.uint32)
    e3 = aot.compiled("toy", (3,), (x, y), _toy, static_args=(3,),
                      platforms=("cpu",))
    e7 = aot.compiled("toy", (7,), (x, y), _toy, static_args=(7,),
                      platforms=("cpu",))
    assert len(list(store.glob("toy-*.jaxexp"))) == 2
    assert int(np.asarray(e3(x, y))[0, 0]) == 4
    assert int(np.asarray(e7(x, y))[0, 0]) == 8


def test_shape_dtype_struct_args(store):
    avals = (jax.ShapeDtypeStruct((8, 128), jnp.uint32),
             jax.ShapeDtypeStruct((8, 128), jnp.uint32))
    exe = aot.compiled("toy", (2,), avals, _toy, static_args=(2,),
                       platforms=("cpu",))
    x = jnp.full((8, 128), 4, jnp.uint32)
    y = jnp.ones((8, 128), jnp.uint32)
    assert int(np.asarray(exe(x, y))[0, 0]) == 9


def test_disabled_falls_back(store, monkeypatch):
    monkeypatch.setenv("BELLMAN_TPU_AOT", "0")
    assert not aot.enabled()
    x = jnp.ones((8, 128), jnp.uint32)
    exe = aot.compiled("toy", (1,), (x, x), _toy, static_args=(1,),
                       platforms=("cpu",))
    # no artifact written when disabled
    assert list(store.glob("*.jaxexp")) == []
    assert int(np.asarray(exe(x, x))[0, 0]) == 2
