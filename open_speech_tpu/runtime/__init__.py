"""Runtime: routers, model registry/manager/lifecycle, continuous batcher."""
