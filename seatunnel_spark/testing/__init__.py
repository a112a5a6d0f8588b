"""In-process protocol replay servers for e2e tests without live
backends (the sandbox has no network): the engine-level analog of the
reference's Testcontainers fixtures."""
