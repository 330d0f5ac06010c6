from ragmeup_tpu.server.app import RagServer, create_wsgi_app

__all__ = ["RagServer", "create_wsgi_app"]
