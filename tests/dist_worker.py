"""Two-process jax.distributed smoke worker (spawned by test_pod_scale.py).

Each process owns one CPU device; after ``initialize_distributed`` the two
processes form one JAX runtime (2 global devices) and a cross-process psum
must see both contributions — the same wiring a multi-host TPU pod uses
(coordinator + XLA collectives), minus the ICI.
"""

import sys


def main() -> None:
    port, pid = sys.argv[1], int(sys.argv[2])
    import jax

    # the session sitecustomize may force jax_platforms='axon,cpu'
    jax.config.update("jax_platforms", "cpu")

    from image_retrieval_for_image_based_localization_tpu.parallel.distributed import (
        initialize_distributed,
        is_primary,
    )

    ok = initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert ok, "initialize_distributed returned single-host"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2, jax.device_count()
    assert jax.local_device_count() == 1, jax.local_device_count()
    assert is_primary() == (pid == 0)

    import jax.numpy as jnp

    # cross-process collective: psum over the global axis sees both procs
    out = jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(
        jnp.ones((1,)) * (pid + 1)
    )
    total = float(out[0])
    assert total == 3.0, total  # 1 (proc 0) + 2 (proc 1)
    print(f"DIST_OK pid={pid} procs={jax.process_count()} psum={total}")


if __name__ == "__main__":
    main()
