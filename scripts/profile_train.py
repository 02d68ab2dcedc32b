"""Profile one training step: compile time, steady-state step time, and the
device-op breakdown (Chrome-trace aggregation) for the synthetic
certification run's configuration.

    python scripts/profile_train.py --batch 4 --steps 3 [--profile]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=4)
    ap.add_argument('--pool', type=int, default=8)
    ap.add_argument('--T', type=int, default=15)
    ap.add_argument('--M', type=int, default=8)
    ap.add_argument('--H', type=int, default=64)
    ap.add_argument('--W', type=int, default=96)
    ap.add_argument('--unroll', type=int, default=14)
    ap.add_argument('--steps', type=int, default=3)
    ap.add_argument('--structure-only', action='store_true')
    ap.add_argument('--profile', action='store_true')
    args = ap.parse_args()

    import numpy as np
    import jax
    try:
        cd = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), '.cache', 'jax')
        os.makedirs(cd, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cd)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
    except Exception as e:
        print(f'[prof] compilation cache unavailable: {e}')
    import jax.numpy as jnp
    from dpvo_tpu.data_readers.synthetic import make_sequence, make_batch_from
    from dpvo_tpu.models.vonet import init_vonet_params
    from dpvo_tpu.train.trainer import (edge_schedule, make_optimizer,
                                        make_train_step)

    print(f'[prof] backend={jax.default_backend()} B={args.batch} '
          f'T={args.T} M={args.M} {args.H}x{args.W} unroll={args.unroll}',
          flush=True)
    seqs = [make_sequence(100 + i, T=args.T, H=args.H, W=args.W, step=0.12)
            for i in range(args.pool)]
    rng = np.random.RandomState(0)
    sched = edge_schedule(args.T, args.M, args.unroll)
    params = {k: jnp.asarray(v) for k, v in init_vonet_params(0).items()}
    opt = make_optimizer(lr=3e-4, total_steps=2000)
    opt_state = opt.init(params)
    step = make_train_step(opt, sched, structure_only=args.structure_only,
                           mixed_precision=False)

    def one(params, opt_state):
        idx = rng.choice(len(seqs), args.batch, replace=False)
        batch = make_batch_from([seqs[i] for i in idx], rng, args.M)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        return step(params, opt_state, batch)

    t0 = time.time()
    params, opt_state, loss, aux = one(params, opt_state)
    print(f'[prof] first step (compile): {time.time()-t0:.1f}s '
          f'loss={float(loss):.4f}', flush=True)

    t0 = time.time()
    for _ in range(args.steps):
        params, opt_state, loss, aux = one(params, opt_state)
    _ = float(loss)
    dt = (time.time() - t0) / args.steps
    print(f'[prof] steady state: {dt:.2f}s/step', flush=True)

    if args.profile:
        import glob, gzip, json, collections
        pd = '/tmp/prof_train'
        os.system(f'rm -rf {pd}')
        with jax.profiler.trace(pd):
            params, opt_state, loss, aux = one(params, opt_state)
            _ = float(loss)
        time.sleep(1)
        files = sorted(glob.glob(pd + '/plugins/profile/*/*.trace.json.gz'))
        tr = json.loads(gzip.open(files[-1]).read())
        events = tr.get('traceEvents', [])
        names = {}
        for e in events:
            if e.get('ph') == 'M' and e.get('name') == 'thread_name':
                names[(e['pid'], e['tid'])] = e['args']['name']
            if e.get('ph') == 'M' and e.get('name') == 'process_name':
                names[(e['pid'], None)] = e['args']['name']
        agg = collections.Counter()
        total = 0.0
        for e in events:
            if e.get('ph') != 'X':
                continue
            pname = names.get((e['pid'], None), '')
            if 'TPU' not in pname and 'device' not in pname.lower():
                continue
            agg[e.get('name', '?')] += e.get('dur', 0)
            total += e.get('dur', 0)
        print(f'[prof] device busy total: {total/1e3:.1f} ms')
        for name, dur in agg.most_common(40):
            print(f'{dur/1e3:10.1f} ms  {name[:110]}')
    print('[prof] done')


if __name__ == '__main__':
    main()
