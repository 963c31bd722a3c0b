from .app import create_app, serve
