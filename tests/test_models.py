"""Model-zoo tests: forward shapes, binarization round-trip, recipe paths.

The reference has no model tests at all (SURVEY.md §4 gaps)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from bnn_tpu import BConfig, named_modules, nn, prepare_binary_model
from bnn_tpu import layers as blayers
from bnn_tpu import models
from bnn_tpu.models.layers import (
    BasicBlock,
    Bottleneck,
    HBlock,
    PreBasicBlock,
    PreBottleneck,
    channel_shuffle,
    drop_path,
)
from bnn_tpu.ops import BasicInputBinarizer, BasicScaleBinarizer, XNORWeightBinarizer

BCONFIG = BConfig(
    activation_pre_process=BasicInputBinarizer,
    activation_post_process=BasicScaleBinarizer,
    weight_pre_process=XNORWeightBinarizer,
)


class TestResNet:
    def test_resnet18_forward_shape(self):
        model = models.resnet18(num_classes=10, rngs=nnx.Rngs(0))
        model.eval()
        x = jnp.ones((2, 64, 64, 3))
        assert model(x).shape == (2, 10)

    def test_resnet18_preact_prelu(self):
        model = models.resnet18(block_type=PreBasicBlock, activation=nn.PReLU,
                                num_classes=10, rngs=nnx.Rngs(0))
        model.eval()
        assert isinstance(model.layer1[0], PreBasicBlock)
        assert isinstance(model.layer1[0].act1, nn.PReLU)
        assert model.layer1[0].act1.weight[...].shape == (64,)
        assert model(jnp.ones((1, 64, 64, 3))).shape == (1, 10)

    @pytest.mark.slow
    def test_resnet50_bottleneck(self):
        model = models.resnet50(num_classes=7, rngs=nnx.Rngs(0))
        model.eval()
        assert isinstance(model.layer1[0], Bottleneck)
        # reference bug fixed: fc input is 512*expansion, not 512
        assert model.fc.in_features == 2048
        assert model(jnp.ones((1, 64, 64, 3))).shape == (1, 7)

    @pytest.mark.slow
    def test_resnet18_dabnn_stem(self):
        model = models.resnet18(stem_type="dabnn", num_classes=10, rngs=nnx.Rngs(0))
        model.eval()
        assert isinstance(model.conv1, models.DaBNNStem)
        assert model(jnp.ones((1, 64, 64, 3))).shape == (1, 10)

    def test_dabnn_stem_inherits_activation(self):
        """The requested activation reaches the stem (the reference
        hard-codes ReLU there even for PReLU nets, ref resnet.py:90)."""
        from bnn_tpu.binarize import named_modules

        model = models.resnet18(stem_type="dabnn", activation=nn.PReLU,
                                num_classes=10, rngs=nnx.Rngs(0))
        acts = {type(m).__name__ for _, m in named_modules(model.conv1)
                if type(m).__name__ in ("ReLU", "PReLU")}
        assert acts == {"PReLU"}

    def test_downsample_is_avgpool_conv_bn(self):
        model = models.resnet18(rngs=nnx.Rngs(0))
        ds = model.layer2[0].downsample
        assert isinstance(ds[0], nn.AvgPool2d)
        assert isinstance(ds[1], nn.Conv2d) and ds[1].kernel_size == (1, 1)
        assert isinstance(ds[2], nn.BatchNorm2d)

    def test_recipe_paths_exist(self):
        # names used by examples/recipes/imagenet-baseline.yaml must resolve
        model = models.resnet18(rngs=nnx.Rngs(0))
        names = {n for n, _ in named_modules(model)}
        for wanted in ("conv1", "fc", "layer2.0.downsample.1",
                       "layer3.0.downsample.1", "layer4.0.downsample.1"):
            assert wanted in names

    def test_binarize_resnet18(self):
        model = models.resnet18(num_classes=10, rngs=nnx.Rngs(0))
        model = prepare_binary_model(
            model, bconfig=BCONFIG, ignore_layers_name=["_first_", "_last_"])
        model.eval()
        assert type(model.conv1) is nn.Conv2d
        assert type(model.fc) is nn.Linear
        assert isinstance(model.layer1[0].conv1, blayers.Conv2d)
        assert model(jnp.ones((1, 64, 64, 3))).shape == (1, 10)

    def test_preact_block_ordering(self):
        # BN stats: PreBasicBlock's bn1 must have inplanes features
        blk = PreBasicBlock(32, 64, stride=1,
                            downsample=nn.Sequential(
                                nn.AvgPool2d(1, 1),
                                nn.Conv2d(32, 64, 1, bias=False, rngs=nnx.Rngs(0)),
                                nn.BatchNorm2d(64, rngs=nnx.Rngs(0))),
                            rngs=nnx.Rngs(0))
        blk.eval()
        assert blk.bn1.num_features == 32
        assert blk(jnp.ones((1, 8, 8, 32))).shape == (1, 8, 8, 64)

    def test_hblock(self):
        blk = HBlock(64, 64, rngs=nnx.Rngs(0))
        blk.eval()
        out = blk(jnp.ones((1, 8, 8, 64)))
        assert out.shape == (1, 8, 8, 64)

    def test_prebottleneck(self):
        blk = PreBottleneck(64, 16, rngs=nnx.Rngs(0))
        blk.eval()
        assert blk(jnp.ones((1, 8, 8, 64))).shape == (1, 8, 8, 64)


class TestBatsOps:
    def test_channel_shuffle(self):
        x = jnp.arange(8.0).reshape(1, 1, 1, 8)
        out = channel_shuffle(x, 4)
        # groups of 2: [0,1 | 2,3 | 4,5 | 6,7] -> interleaved [0,2,4,6,1,3,5,7]
        np.testing.assert_array_equal(out.ravel(), [0, 2, 4, 6, 1, 3, 5, 7])

    def test_drop_path_mask_shape(self):
        x = jnp.ones((8, 4, 4, 3))
        out = drop_path(x, 0.5, jax.random.key(0))
        per_sample = np.asarray(out).reshape(8, -1)
        # each sample is either all zeros or all 1/keep_prob
        for row in per_sample:
            assert np.all(row == 0.0) or np.allclose(row, 2.0)

    def test_zero_op_ceil_stride_shape(self):
        """Zero ('none') must produce ceil(h/s) like the reference's
        x[:, :, ::s, ::s] — floor mismatches the other strided ops on odd
        maps and crashes the cell-edge sum."""
        from bnn_tpu.models.layers.bats_ops import Zero

        assert Zero(2)(jnp.ones((1, 7, 7, 4))).shape == (1, 4, 4, 4)
        assert Zero(2)(jnp.ones((1, 8, 8, 4))).shape == (1, 4, 4, 4)

    def test_drop_path_zero_prob_identity(self):
        x = jnp.ones((2, 2, 2, 2))
        np.testing.assert_array_equal(drop_path(x, 0.0, jax.random.key(0)), x)


class TestBatsNetworks:
    @pytest.mark.slow
    def test_cifar_network_forward(self):
        net = models.BATSNetworkCIFAR(C=16, num_classes=10, layers=4,
                                      auxiliary=False,
                                      genotype=models.BATS_EXAMPLE, groups=4,
                                      rngs=nnx.Rngs(0))
        net.eval()
        logits, aux = net(jnp.ones((2, 32, 32, 3)))
        assert logits.shape == (2, 10)
        assert aux is None

    @pytest.mark.slow
    def test_cifar_network_train_with_droppath_and_aux(self):
        net = models.BATSNetworkCIFAR(C=16, num_classes=10, layers=4,
                                      auxiliary=True,
                                      genotype=models.BATS_EXAMPLE, groups=4,
                                      rngs=nnx.Rngs(0))
        net.train()  # flips `deterministic` via nnx set_attributes
        assert net.deterministic is False
        net.drop_path_prob = 0.2
        logits, aux = net(jnp.ones((2, 32, 32, 3)))
        assert logits.shape == (2, 10)
        assert aux is not None and aux.shape == (2, 10)

    @pytest.mark.slow
    def test_imagenet_network_forward(self):
        net = models.BATSNetworkImageNet(C=20, num_classes=10, layers=4,
                                         auxiliary=False,
                                         genotype=models.BATS_EXAMPLE, groups=4,
                                         rngs=nnx.Rngs(0))
        net.eval()
        # the fixed AvgPool2d(7) head assumes a 224-style input (7x7 final
        # feature map), as in the reference (bnn/models/bats.py:192)
        logits, _ = net(jnp.ones((1, 224, 224, 3)))
        assert logits.shape == (1, 10)

    def test_bats_binarizes(self):
        net = models.BATSNetworkCIFAR(C=16, num_classes=10, layers=2,
                                      auxiliary=False,
                                      genotype=models.BATS_EXAMPLE, groups=4,
                                      rngs=nnx.Rngs(0))
        net = prepare_binary_model(net, bconfig=BCONFIG,
                                   ignore_layers_name=["_first_", "_last_"])
        net.eval()
        num_binary = sum(isinstance(m, (blayers.Conv2d, blayers.Linear))
                         for _, m in named_modules(net))
        assert num_binary > 0
        logits, _ = net(jnp.ones((1, 32, 32, 3)))
        assert logits.shape == (1, 10)


class TestAttentionReadiness:
    """The binarizer/transformation machinery must extend beyond CNNs
    (SURVEY.md §5.7)."""

    def test_mha_binarizes_and_runs(self):
        rngs = nnx.Rngs(0)
        block = nn.MultiheadAttention(64, 4, rngs=rngs)
        block = prepare_binary_model(block, bconfig=BCONFIG)
        from bnn_tpu import layers as bl
        assert isinstance(block.q_proj, bl.Linear)
        assert isinstance(block.out_proj, bl.Linear)
        x = jax.random.normal(jax.random.key(1), (2, 10, 64))
        out = block(x)
        assert out.shape == (2, 10, 64)

    def test_mha_ignore_out_proj(self):
        rngs = nnx.Rngs(0)
        block = nn.MultiheadAttention(32, 2, rngs=rngs)
        block = prepare_binary_model(block, bconfig=BCONFIG,
                                     ignore_layers_name=["$out_proj$"])
        assert type(block.out_proj) is nn.Linear

    def test_binary_transformer_block_trains(self):
        import optax

        class Block(nnx.Module):
            def __init__(self, rngs):
                self.ln1 = nn.LayerNorm(32, rngs=rngs)
                self.attn = nn.MultiheadAttention(32, 4, rngs=rngs)
                self.ln2 = nn.LayerNorm(32, rngs=rngs)
                self.fc1 = nn.Linear(32, 64, rngs=rngs)
                self.fc2 = nn.Linear(64, 32, rngs=rngs)
                self.head = nn.Linear(32, 2, rngs=rngs)

            def __call__(self, x):
                x = x + self.attn(self.ln1(x))
                h = self.fc2(jax.nn.gelu(self.fc1(self.ln2(x))))
                x = x + h
                return self.head(jnp.mean(x, axis=1))

        model = prepare_binary_model(Block(nnx.Rngs(0)), bconfig=BCONFIG,
                                     ignore_layers_name=["_last_"])
        opt = nnx.Optimizer(model, optax.adam(1e-2), wrt=nnx.Param)
        x = jax.random.normal(jax.random.key(2), (8, 6, 32))
        y = jax.random.randint(jax.random.key(3), (8,), 0, 2)

        @nnx.jit
        def step(model, opt, x, y):
            def loss_fn(m):
                import optax as _o
                return _o.softmax_cross_entropy_with_integer_labels(
                    m(x), y).mean()
            loss, grads = nnx.value_and_grad(loss_fn)(model)
            opt.update(model, grads)
            return loss

        l0 = float(step(model, opt, x, y))
        for _ in range(20):
            l = float(step(model, opt, x, y))
        assert l < l0
