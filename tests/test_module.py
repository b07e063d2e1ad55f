"""Module-system tests — mirrors reference ``tests/test_module.py`` plus the
functional-apply and param-stacking machinery that is new in the TPU build."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eddie_wang_hackathon2023_tpu import Module, ModuleList, Parameter, stack_params
from eddie_wang_hackathon2023_tpu.layers import Linear


class Block(Module):

    def __init__(self):
        super().__init__()
        self.fc = Linear(4, 4, dtype="float32")
        self.scale = Parameter(shape=(1,), dtype="float32")

    def forward(self, x):
        y = self.fc(x) * self.scale.value
        self.register_network_output("scaled", y)
        return y


class Net(Module):

    def __init__(self, n=3):
        super().__init__()
        self.blocks = ModuleList([Block() for _ in range(n)])

    def forward(self, x):
        for b in self.blocks:
            x = b(x)
        return x


def test_named_parameters_paths():
    net = Net()
    names = [n for n, _ in net.named_parameters()]
    assert "blocks.0.fc.weight" in names
    assert "blocks.2.scale" in names
    assert len(names) == 9


def test_state_dict_roundtrip():
    net = Net()
    net.random_init(jax.random.PRNGKey(0))
    sd = net.state_dict()
    net2 = Net()
    net2.load_state_dict(sd)
    x = jnp.ones((1, 4))
    np.testing.assert_allclose(np.asarray(net(x)), np.asarray(net2(x)))


def test_load_state_dict_strict_errors():
    net = Net()
    with pytest.raises(KeyError):
        net.load_state_dict({"nope": np.zeros(1)})


def test_apply_is_pure_and_jittable():
    net = Net()
    net.random_init(jax.random.PRNGKey(1))
    sd = net.state_dict()
    x = jnp.ones((2, 4))
    eager = np.asarray(net(x))
    jitted = jax.jit(lambda p, x: net.apply(p, x))
    np.testing.assert_allclose(np.asarray(jitted(sd, x)), eager, rtol=1e-6)
    # params restored after apply (not left as tracers)
    assert net.blocks[0].fc.weight.is_inited
    _ = net(x)  # still concrete-callable


def test_apply_with_modified_params():
    net = Net()
    net.random_init(jax.random.PRNGKey(2))
    sd = dict(net.state_dict())
    sd2 = {k: v * 0 for k, v in sd.items()}
    out = net.apply(sd2, jnp.ones((1, 4)))
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_stack_params_for_scan():
    net = Net(4)
    net.random_init(jax.random.PRNGKey(3))
    stacked = stack_params([b.state_dict() for b in net.blocks])
    assert stacked["fc.weight"].shape == (4, 4, 4)
    # scanning one block over the stacked params == sequential loop
    block = net.blocks[0]
    x = jnp.ones((1, 4))

    def step(h, layer_params):
        return block.apply(dict(layer_params), h), None

    scanned, _ = jax.lax.scan(step, x, stacked)
    np.testing.assert_allclose(np.asarray(scanned), np.asarray(net(x)),
                               rtol=1e-5)


def test_network_output_collection():
    net = Net(2)
    net.random_init(jax.random.PRNGKey(4))
    net.collect_network_outputs(True)
    net(jnp.ones((1, 4)))
    outs = net.network_outputs()
    assert "blocks.0.scaled" in outs and "blocks.1.scaled" in outs
    net.collect_network_outputs(False)
    net(jnp.ones((1, 4)))
    assert not net.network_outputs()
