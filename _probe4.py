import logging, sys, time, numpy as np
logging.basicConfig(level=logging.DEBUG, stream=sys.stderr)
for n in ['jax._src.compiler','jax._src.lru_cache','jax._src.interpreters.pxla','jax._src.dispatch']:
    logging.getLogger(n).setLevel(logging.DEBUG)
from ringo_tpu import backend, jindo
from ringo_tpu.fields import ZP255
from ringo_tpu.jindo.prover import sample_field_digits
backend.use('jax')
params=jindo.new_parameters(ZP255,1<<13,1)
prv=jindo.Prover(params,b'Jindo!',seed=b'probe')
v=sample_field_digits(ZP255,1<<13,prv.uniform)
t0=time.time(); c,o=prv.commit(v); np.asarray(c.value[0,0,0,0]); print('warm(compile+load)',time.time()-t0, flush=True)
for _ in range(3):
    t0=time.time(); c,o=prv.commit(v); np.asarray(c.value[0,0,0,0]); print('commit',time.time()-t0, flush=True)
