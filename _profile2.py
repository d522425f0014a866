import time, numpy as np
import jax, jax.numpy as jnp
from sln_amodal_tpu.config import inference_config
from sln_amodal_tpu.models.sln import SLNAmodal, init_params

cfg = inference_config(compute_dtype="bfloat16")
model = SLNAmodal(cfg)
v = init_params(cfg, jax.random.PRNGKey(0))
s = cfg.image_size
images = jnp.zeros((1, s, s, 3), jnp.float32)
windows = jnp.asarray([[0.,0.,float(s),float(s)]], jnp.float32)

class Probe(SLNAmodal):
    def glm_only(self, images):
        return self._glm_prior(images)[0].sum()
    def fpn_rpn(self, images):
        feats = self.fpn(images)
        l, p, d = self._rpn_all_levels(feats)
        return l.sum() + d.sum()
    def through_proposals(self, images):
        feats = self.fpn(images)
        _, p, d = self._rpn_all_levels(feats)
        rois, val = self._proposals(p, d, self.config.post_nms_rois_inference)
        return rois.sum()
    def through_classifier(self, images):
        feats = self.fpn(images)
        _, p, d = self._rpn_all_levels(feats)
        rois, val = self._proposals(p, d, self.config.post_nms_rois_inference)
        cl, pr, bd = self._classifier_on(feats[:4], rois)
        return pr.sum()
    def full(self, images, windows):
        out = self.infer(images, windows)
        return out.detections.sum() + out.masks.sum()

pm = Probe(cfg)

def timeit(name, fn, *args, n=20):
    jf = jax.jit(fn)
    r = jf(v, *args); jax.block_until_ready(r); float(r)
    # chain through the image to serialize iterations
    def chained(img, *rest):
        out = jf(v, img, *rest)
        return img + (out * 0).astype(img.dtype), out
    t0=time.perf_counter()
    x = args[0]
    for _ in range(n):
        x, out = chained(x, *args[1:])
    float(out)
    dt=(time.perf_counter()-t0)/n
    print(f"{name:22s} {dt*1000:8.2f} ms")

timeit("glm", lambda vv,x: pm.apply(vv,x,method=Probe.glm_only), images)
timeit("fpn+rpn", lambda vv,x: pm.apply(vv,x,method=Probe.fpn_rpn), images)
timeit("..+proposals", lambda vv,x: pm.apply(vv,x,method=Probe.through_proposals), images)
timeit("..+classifier", lambda vv,x: pm.apply(vv,x,method=Probe.through_classifier), images)
timeit("full", lambda vv,x,w: pm.apply(vv,x,w,method=Probe.full), images, windows)
