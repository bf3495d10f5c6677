"""Orbax backend: sharded save -> restore under different shardings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from hyperpri_tpu.parallel.mesh import make_mesh
from hyperpri_tpu.train.orbax_io import OrbaxCheckpointer


def test_save_restore_roundtrip(tmp_path):
    ck = OrbaxCheckpointer(str(tmp_path / "ckpt"), async_save=False)
    tree = {"w": jnp.arange(16.0).reshape(4, 4), "step": jnp.asarray(3)}
    ck.save(3, tree, wait=True)
    assert ck.latest_step() == 3
    out = ck.restore(3, target=tree)
    np.testing.assert_array_equal(np.asarray(out["w"]), np.asarray(tree["w"]))
    ck.close()


def test_restore_redistributes_to_new_sharding(tmp_path):
    mesh = make_mesh({"data": 8})
    sharded = jax.device_put(
        jnp.arange(64.0).reshape(8, 8), NamedSharding(mesh, P("data", None))
    )
    ck = OrbaxCheckpointer(str(tmp_path / "ckpt"), async_save=False)
    ck.save(0, {"w": sharded}, wait=True)

    # restore with a DIFFERENT layout: replicated
    target = {"w": jax.device_put(jnp.zeros((8, 8)), NamedSharding(mesh, P()))}
    out = ck.restore(0, target=target)
    np.testing.assert_array_equal(np.asarray(out["w"]), np.arange(64.0).reshape(8, 8))
    assert out["w"].sharding.spec == P()
    ck.close()
