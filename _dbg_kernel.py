import os
os.environ["JAX_TRACEBACK_FILTERING"]="off"
import jax, jax.numpy as jnp, numpy as np
from sln_amodal_tpu.ops.nms_pallas import nms_sorted_pallas
b = np.random.RandomState(0).rand(256,4).astype(np.float32)*100
b[:,2:]+=b[:,:2]
try:
    k,v = nms_sorted_pallas(jnp.asarray(b), jnp.ones(256,bool), 100, 0.5)
    print("ok", np.asarray(v).sum())
except Exception as e:
    import traceback; tb = traceback.format_exc()
    lines = [l for l in tb.splitlines() if 'nms_pallas' in l or 'gather' in l or 'Shape mismatch' in l]
    print("\n".join(lines[-12:]))
