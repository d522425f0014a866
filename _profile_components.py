"""Per-component TPU timing with chained deps (axon-safe)."""
import time, numpy as np
import jax, jax.numpy as jnp
from sln_amodal_tpu.config import inference_config
from sln_amodal_tpu.models.sln import SLNAmodal, init_params
from sln_amodal_tpu.detect.proposal import proposal_layer
from sln_amodal_tpu.ops.anchors import config_anchors

cfg = inference_config(compute_dtype="bfloat16")
model = SLNAmodal(cfg)
v = init_params(cfg, jax.random.PRNGKey(0))
s = cfg.image_size
images = jnp.zeros((1, s, s, 3), jnp.float32)
windows = jnp.asarray([[0.,0.,float(s),float(s)]], jnp.float32)
anchors = jnp.asarray(config_anchors(cfg))

class Probe(SLNAmodal):
    def fpn_rpn(self, images):
        feats = self.fpn(images)
        return self._rpn_all_levels(feats)[1:], feats[0].sum()
    def glm_only(self, images):
        return self._glm_prior(images)[0].sum()
    def full(self, images, windows):
        out = self.infer(images, windows)
        return out.detections.sum() + out.masks.sum()

pm = Probe(cfg)

def timeit(name, fn, *args, n=8):
    f = jax.jit(fn)
    r = f(*args); jax.block_until_ready(r); float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(n):
        r = f(*args)
        # chain: force completion via host fetch each iter (upper bound incl. latency)
        acc += float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:24s} {dt*1000:8.2f} ms")
    return dt

timeit("glm(513x3scale)", lambda vv, x: pm.apply(vv, x, method=Probe.glm_only), v, images)
timeit("fpn+rpn", lambda vv, x: pm.apply(vv, x, method=Probe.fpn_rpn), v, images)

# proposal NMS alone
probs = jax.random.uniform(jax.random.PRNGKey(1), (cfg.num_anchors, 2))
deltas = jax.random.normal(jax.random.PRNGKey(2), (cfg.num_anchors, 4)) * 0.1
def prop(p, d):
    r, val = proposal_layer(p, d, anchors, proposal_count=cfg.post_nms_rois_inference,
        nms_threshold=cfg.rpn_nms_threshold, image_size=s,
        rpn_bbox_std_dev=cfg.rpn_bbox_std_dev, pre_nms_limit=cfg.pre_nms_limit)
    return r.sum()
timeit("proposal+nms(6000->1000)", prop, probs, deltas)

timeit("FULL infer", lambda vv, x, w: pm.apply(vv, x, w, method=Probe.full), v, images, windows)
# host->device transfer cost
def ident(x): return x.sum()
timeit("image transfer+sum", ident, np.zeros((1,s,s,3), np.float32))
