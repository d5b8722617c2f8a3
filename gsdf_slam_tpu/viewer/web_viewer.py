"""Web viewer: the TPU-native replacement for the ImGui/OpenGL viewer.

The reference viewer (viewer/imgui_viewer.cpp) runs a GLFW window on the
training machine: a free-fly camera rendered via GaussianMapper::renderFromPose
plus live hyperparameter sliders round-tripped through get/setVaribleParameters.
A TPU VM has no display, so the equivalent surface is a tiny stdlib HTTP
server + single-page client:

    GET  /            -> canvas UI (WASD + mouse-drag free-fly, sliders)
    GET  /render?...  -> JPEG rendered from the requested pose
    GET  /params      -> current VariableParameters (JSON)
    POST /params      -> live update (maps to setVaribleParameters)
    GET  /stats       -> iteration / point count / ema loss
    GET  /scene       -> keyframe frusta + trajectory + sparse points for
                         the client-side overlays (drawer_utils.h:1-111
                         draws the same three things in OpenGL; here the
                         client projects them over the rendered canvas)

Runs in a host thread next to the training loop, like the reference's
viewer thread (demo/train_kitti.cpp:73-82); renders share the jitted
renderFromPose path (one compile per viewer resolution).
"""

from __future__ import annotations

import io
import json
import math
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>gsdf_slam_tpu viewer</title><style>
body{margin:0;background:#111;color:#ddd;font-family:monospace;display:flex}
#view{flex:1;position:relative} #panel{width:280px;padding:12px;background:#1a1a1a}
canvas{display:block;width:100%} label{display:block;margin-top:8px;font-size:11px}
#ov{position:absolute;left:0;top:0;pointer-events:none}
input[type=range]{width:100%} #stats{white-space:pre;font-size:11px;margin-top:12px}
.tog{margin-top:4px;font-size:11px}
</style></head><body>
<div id=view><canvas id=c width=640 height=360></canvas>
<canvas id=ov width=640 height=360></canvas></div>
<div id=panel><b>gsdf_slam_tpu</b>
<div class=tog><input type=checkbox id=show_kf checked>keyframes
 <input type=checkbox id=show_traj checked>trajectory
 <input type=checkbox id=show_pts>points</div>
<div id=sliders></div><div id=stats></div></div>
<script>
let yaw=0,pitch=0,pos=[0,0,-2],keys={},scene=null;
const c=document.getElementById('c');
document.addEventListener('keydown',e=>keys[e.key]=1);
document.addEventListener('keyup',e=>keys[e.key]=0);
let drag=null;
c.addEventListener('mousedown',e=>drag=[e.x,e.y]);
document.addEventListener('mouseup',()=>drag=null);
document.addEventListener('mousemove',e=>{if(drag){yaw+=(e.x-drag[0])*0.003;pitch+=(e.y-drag[1])*0.003;drag=[e.x,e.y];}});
function step(){
  const s=0.08,cy=Math.cos(yaw),sy=Math.sin(yaw);
  const fwd=[sy,0,cy],right=[cy,0,-sy];
  if(keys['w'])pos=pos.map((v,i)=>v+fwd[i]*s);
  if(keys['s'])pos=pos.map((v,i)=>v-fwd[i]*s);
  if(keys['a'])pos=pos.map((v,i)=>v-right[i]*s);
  if(keys['d'])pos=pos.map((v,i)=>v+right[i]*s);
  if(keys['q'])pos[1]-=s; if(keys['e'])pos[1]+=s;
}
// ---- scene overlays (frusta / trajectory / sparse points): the web
// equivalent of the ImGui viewer's GL drawers (drawer_utils.h:1-111).
// World geometry is projected with the SAME free-fly camera the /render
// request uses, then stroked on the transparent overlay canvas.
function project(p){
  // world -> camera: R_wc^T (p - pos), OpenCV convention (matches
  // _pose_from_query server-side)
  const cy=Math.cos(yaw),sy=Math.sin(yaw),cp=Math.cos(pitch),sp=Math.sin(pitch);
  // R_wc = Ry @ Rx; columns of R_wc are camera axes in world
  const r=[[cy, sy*sp, sy*cp],[0, cp, -sp],[-sy, cy*sp, cy*cp]];
  const d=[p[0]-pos[0],p[1]-pos[1],p[2]-pos[2]];
  const x=r[0][0]*d[0]+r[1][0]*d[1]+r[2][0]*d[2];
  const y=r[0][1]*d[0]+r[1][1]*d[1]+r[2][1]*d[2];
  const z=r[0][2]*d[0]+r[1][2]*d[1]+r[2][2]*d[2];
  if(z<0.05)return null;
  const fx=(scene&&scene.fx)||320, fy=(scene&&scene.fy)||320;
  return [320+fx*x/z, 180+fy*y/z];
}
function line(ctx,a,b){const pa=project(a),pb=project(b);
  if(pa&&pb){ctx.beginPath();ctx.moveTo(pa[0],pa[1]);ctx.lineTo(pb[0],pb[1]);ctx.stroke();}}
function drawOverlay(){
  const ctx=document.getElementById('ov').getContext('2d');
  ctx.clearRect(0,0,640,360);
  if(!scene)return;
  if(document.getElementById('show_kf').checked){
    ctx.strokeStyle='#4af';ctx.lineWidth=1;
    for(const f of scene.frusta){
      const [o,a,b,cc,d]=f;
      line(ctx,o,a);line(ctx,o,b);line(ctx,o,cc);line(ctx,o,d);
      line(ctx,a,b);line(ctx,b,cc);line(ctx,cc,d);line(ctx,d,a);
    }
  }
  if(document.getElementById('show_traj').checked&&scene.trajectory.length>1){
    ctx.strokeStyle='#fa4';ctx.lineWidth=2;
    for(let i=1;i<scene.trajectory.length;i++)
      line(ctx,scene.trajectory[i-1],scene.trajectory[i]);
  }
  if(document.getElementById('show_pts').checked){
    ctx.fillStyle='#6f6';
    for(const p of scene.points){const q=project(p);
      if(q)ctx.fillRect(q[0]-1,q[1]-1,2,2);}
  }
}
async function pollScene(){
  try{scene=await (await fetch('/scene')).json();}catch(e){}
  setTimeout(pollScene,2000);
}
async function loop(){
  step();
  const q=`yaw=${yaw}&pitch=${pitch}&x=${pos[0]}&y=${pos[1]}&z=${pos[2]}&w=640&h=360`;
  const img=new Image();
  img.onload=()=>{c.getContext('2d').drawImage(img,0,0);drawOverlay();requestAnimationFrame(loop)};
  img.onerror=()=>setTimeout(loop,500);
  img.src='/render?'+q+'&t='+Date.now();
}
async function stats(){
  try{const r=await fetch('/stats');document.getElementById('stats').textContent=
    JSON.stringify(await r.json(),null,1);}catch(e){}
  setTimeout(stats,1000);
}
async function buildSliders(){
  const p=await (await fetch('/params')).json();
  const div=document.getElementById('sliders');
  for(const[k,v]of Object.entries(p)){
    if(typeof v!=='number')continue;
    const l=document.createElement('label');
    l.textContent=k+' = '+v;
    const r=document.createElement('input');
    r.type='range';r.min=0;r.max=Math.max(v*4,1e-6);r.step=Math.max(v/100,1e-7);r.value=v;
    r.oninput=async()=>{l.firstChild.textContent=k+' = '+r.value;
      const tok=new URLSearchParams(location.search).get('token');
      await fetch('/params',{method:'POST',headers:tok?{'X-Viewer-Token':tok}:{},
        body:JSON.stringify({[k]:parseFloat(r.value)})});};
    div.appendChild(l);l.appendChild(r);
  }
}
buildSliders();stats();pollScene();loop();
</script></body></html>"""


def _pose_from_query(q) -> np.ndarray:
    yaw = float(q.get("yaw", ["0"])[0])
    pitch = float(q.get("pitch", ["0"])[0])
    pos = np.array(
        [float(q.get(k, ["0"])[0]) for k in ("x", "y", "z")], dtype=np.float64
    )
    cy, sy = math.cos(yaw), math.sin(yaw)
    cp, sp = math.cos(pitch), math.sin(pitch)
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    r_wc = ry @ rx  # camera->world rotation
    t_cw = np.eye(4)
    t_cw[:3, :3] = r_wc.T
    t_cw[:3, 3] = -r_wc.T @ pos
    return t_cw.astype(np.float32)


#: Allowed /render sizes. Each new (w, h) forces a fresh jit compile of the
#: render pipeline, so arbitrary client-chosen sizes are a DoS surface.
RENDER_SIZES = ((320, 180), (640, 360), (960, 540), (1280, 720))


class ViewerServer:
    def __init__(
        self,
        mapper,
        host: str = "127.0.0.1",
        port: int = 8090,
        token: str | None = None,
    ):
        """`host` defaults to loopback: the reference viewer is a local GLFW
        window (viewer/imgui_viewer.cpp) and never exposes training control
        to the network. Pass host="0.0.0.0" + a `token` to serve remotely;
        with a token set, POST /params requires an `X-Viewer-Token` header
        (the page injects it automatically when loaded with ?token=...)."""
        self.mapper = mapper
        self.token = token
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _send(self, code, body, ctype="application/json"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/":
                    self._send(200, _PAGE.encode(), "text/html")
                elif u.path == "/render":
                    q = parse_qs(u.query)
                    w = int(q.get("w", ["640"])[0])
                    h = int(q.get("h", ["360"])[0])
                    # snap to the nearest whitelisted size (compile-cache DoS
                    # guard; see RENDER_SIZES)
                    w, h = min(
                        RENDER_SIZES, key=lambda s: abs(s[0] - w) + abs(s[1] - h)
                    )
                    if outer.mapper.state is None:
                        self._send(503, b"{}")
                        return
                    img = outer.mapper.render_from_pose(_pose_from_query(q), w, h)
                    buf = io.BytesIO()
                    try:
                        import cv2

                        ok, enc = cv2.imencode(
                            ".jpg",
                            cv2.cvtColor(
                                (np.clip(img, 0, 1) * 255).astype(np.uint8),
                                cv2.COLOR_RGB2BGR,
                            ),
                        )
                        buf.write(enc.tobytes())
                    except ImportError:
                        from PIL import Image

                        Image.fromarray(
                            (np.clip(img, 0, 1) * 255).astype(np.uint8)
                        ).save(buf, "JPEG")
                    self._send(200, buf.getvalue(), "image/jpeg")
                elif u.path == "/params":
                    import dataclasses

                    p = outer.mapper.get_variable_parameters()
                    self._send(200, json.dumps(dataclasses.asdict(p)).encode())
                elif u.path == "/scene":
                    self._send(200, json.dumps(outer._scene_payload()).encode())
                elif u.path == "/stats":
                    m = outer.mapper
                    self._send(
                        200,
                        json.dumps(
                            {
                                "iteration": m.iteration,
                                "points": int(m.state.count) if m.state is not None else 0,
                                "ema_loss": round(m.ema_loss, 6),
                                "keyframes": len(m.scene.keyframes),
                            }
                        ).encode(),
                    )
                else:
                    self._send(404, b"{}")

            def do_POST(self):
                if urlparse(self.path).path == "/params":
                    if (
                        outer.token is not None
                        and self.headers.get("X-Viewer-Token") != outer.token
                    ):
                        self._send(403, b'{"error": "bad token"}')
                        return
                    n = int(self.headers.get("Content-Length", 0))
                    updates = json.loads(self.rfile.read(n) or b"{}")
                    p = outer.mapper.get_variable_parameters()
                    for k, v in updates.items():
                        if hasattr(p, k):
                            setattr(p, k, type(getattr(p, k))(v))
                    outer.mapper.set_variable_parameters(p)
                    self._send(200, b"{}")
                else:
                    self._send(404, b"{}")

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)

    def _scene_payload(self) -> dict:
        """Keyframe frusta + trajectory + sparse points for the overlay —
        the data the reference viewer's drawers consume (drawer_utils.h:
        1-111: DrawFrustum/DrawTrajectory/DrawPoints; toggled from the
        ImGui display panel, imgui_viewer.cpp)."""
        import math as _m

        m = self.mapper
        kfs = sorted(m.scene.keyframes.values(), key=lambda k: k.fid)
        extent = max(float(getattr(m.scene, "cameras_extent", 1.0) or 1.0), 0.5)
        d = 0.12 * extent
        frusta, traj = [], []
        for kf in kfs:
            c2w = np.linalg.inv(np.asarray(kf.t_cw, np.float64))
            o = c2w[:3, 3]
            tx = _m.tan(kf.camera.fovx / 2) * d
            ty = _m.tan(kf.camera.fovy / 2) * d
            corners = [
                c2w[:3, :3] @ np.array([sx * tx, sy * ty, d]) + o
                for sx, sy in ((-1, -1), (1, -1), (1, 1), (-1, 1))
            ]
            frusta.append(
                [np.round(o, 4).tolist()]
                + [np.round(cp, 4).tolist() for cp in corners]
            )
            traj.append(np.round(o, 4).tolist())
        if m.sparse_points_xyz:
            pts = np.concatenate(m.sparse_points_xyz)
        elif m.state is not None and int(m.state.count) > 0:
            pts = np.asarray(m.state.xyz[: int(m.state.count)])
        else:
            pts = np.zeros((0, 3), np.float32)
        if len(pts) > 2000:
            pts = pts[:: len(pts) // 2000 + 1]
        cam0 = next(iter(m.scene.cameras.values()), None)
        fovx = cam0.fovx if cam0 else _m.pi / 2
        fovy = cam0.fovy if cam0 else _m.pi / 2
        return {
            "frusta": frusta,
            "trajectory": traj,
            "points": np.round(pts, 4).tolist(),
            # client projection focals for the 640x360 overlay canvas
            "fx": 320.0 / _m.tan(fovx / 2),
            "fy": 180.0 / _m.tan(fovy / 2),
        }

    def start(self):
        self.thread.start()
        return self

    def stop(self):
        self.httpd.shutdown()
